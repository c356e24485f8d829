"""Train D3Feat on KITTI odometry (reference entry: training_KITTI.py).

Usage:
  python scripts/train_kitti.py --data data/kitti [--save-dir ...]
      [--resident] [--restore ...] [--epochs N] [--steps N] [--cpu]

`--resident` uses the device-resident cached-pyramid loop shared with
the 3DMatch script (`d3feat_tpu.train.resident`).  Scale augmentation is
disabled in that mode (a cached pyramid cannot replay scale — it changes
which points fall inside the fixed search radii; rotation/jitter ride
the rel vectors on device, and translation is a no-op because the
network only consumes relative vectors).  The rebuild-per-step host
pipeline keeps full reference augmentation semantics.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/kitti')
    ap.add_argument('--save-dir', default=None)
    ap.add_argument('--epochs', type=int, default=None)
    ap.add_argument('--steps', type=int, default=None)
    ap.add_argument('--restore', default=None,
                    help='log dir (latest snap-N) or a snap-N path')
    ap.add_argument('--lr', type=float, default=None)
    ap.add_argument('--grad-skip-threshold', type=float, default=None)
    ap.add_argument('--grad-global-clip', type=float, default=None)
    ap.add_argument('--score-dtype', default=None,
                    choices=['compute', 'float32'])
    ap.add_argument('--max-points', type=int, default=None,
                    help='stacked-pair point capacity (KITTI pairs at '
                         '0.30 m voxel stack to ~60-90k points)')
    ap.add_argument('--resident', action='store_true',
                    help='device-resident cached dataset (tunneled TPUs); '
                         'disables scale augmentation — see module doc')
    ap.add_argument('--max-cached-pairs', type=int, default=None)
    ap.add_argument('--pool-shards', type=int, default=1,
                    help='resident: rotate the cached pool through HBM in '
                         'N equal shards (see train_3dmatch.py)')
    ap.add_argument('--shard-epochs', type=int, default=2)
    ap.add_argument('--dp', type=int, default=0,
                    help='resident: mesh-data-parallel over N devices '
                         '(sharded pool + ICI grad pmean)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import kitti_config
    from d3feat_tpu.data.kitti import KITTIDataset
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.train.trainer import Trainer, create_train_state

    cfg = kitti_config()
    if args.steps:
        cfg = cfg.replace(epoch_steps=args.steps)
    if args.max_points:
        cfg = cfg.replace(max_points=args.max_points)
    if args.lr is not None:
        cfg = cfg.replace(learning_rate=args.lr)
    if args.grad_skip_threshold is not None:
        cfg = cfg.replace(grad_skip_threshold=args.grad_skip_threshold)
    if args.grad_global_clip is not None:
        cfg = cfg.replace(grad_global_clip=args.grad_global_clip)
    if args.score_dtype is not None:
        cfg = cfg.replace(score_dtype=args.score_dtype)
    if args.resident:
        cfg = cfg.replace(augment_scale_min=1.0, augment_scale_max=1.0)
        print('# resident mode: scale augmentation disabled (cached '
              'pyramids cannot replay scale)', flush=True)
    save_dir = args.save_dir or time.strftime('results_kitti/Log_%m%d%H%M')

    dataset = KITTIDataset(args.data, cfg.first_subsampling_dl)
    rng = np.random.default_rng(42)

    if args.resident:
        from d3feat_tpu.data.cache import build_cache_from_kitti
        t0 = time.perf_counter()
        cache = build_cache_from_kitti(dataset, 'train', cfg,
                                       max_pairs=args.max_cached_pairs,
                                       rng=rng)
        print(f'cached {len(cache)} pair pyramids in '
              f'{time.perf_counter() - t0:.0f} s', flush=True)
        train_it = cache.train_batches(rng)
    else:
        cache = None
        train_it = dataset.train_batches(cfg, rng, 'train')

    first = next(train_it)
    model, variables = init_kpfcnn(cfg, first['pyramid'])
    state = create_train_state(cfg, variables)
    snap = None
    if args.restore:
        from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                                 restore_checkpoint)
        snap = args.restore
        if not os.path.basename(snap.rstrip('/')).startswith('snap-'):
            snap = latest_snapshot(snap)
        print(f'restoring {snap}', flush=True)
        state = restore_checkpoint(snap, state)

    if args.resident:
        from d3feat_tpu.train.resident import run_resident_training
        pool = (cache.split_shards(args.pool_shards, rng)
                if args.pool_shards > 1 else cache)
        mesh = None
        if args.dp:
            from d3feat_tpu.parallel import make_mesh
            mesh = make_mesh(args.dp)
        run_resident_training(cfg, pool, state, save_dir, rng=rng,
                              epochs=args.epochs, restore_snap=snap,
                              shard_epochs=args.shard_epochs, mesh=mesh)
        return

    trainer = Trainer(cfg, save_dir)
    trainer.train(
        state,
        train_batches=lambda: dataset.train_batches(cfg, rng, 'train'),
        val_batches=lambda: dataset.train_batches(
            cfg, np.random.default_rng(7), 'val'),
        num_epochs=args.epochs)


if __name__ == '__main__':
    main()
