"""Train D3Feat on 3DMatch (reference entry point: training_3DMatch.py).

Usage:
  python scripts/train_3dmatch.py --data data/3DMatch [--save-dir results/...]
                                  [--epochs N] [--steps N] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/3DMatch')
    ap.add_argument('--save-dir', default=None)
    ap.add_argument('--epochs', type=int, default=None)
    ap.add_argument('--steps', type=int, default=None)
    ap.add_argument('--restore', default=None,
                    help='log dir (resumes latest snap-N) or a specific '
                         'snap-N path (reference restore_snap analog, '
                         'utils/trainer.py:97-104)')
    ap.add_argument('--reset-step', action='store_true',
                    help='with --restore: keep params/BN/kpoints but zero '
                         'the step counter and re-init optimizer state — '
                         'fine-tune semantics (fresh lr schedule + epoch '
                         'numbering + momentum) instead of resume '
                         'semantics (the restored count would decay lr by '
                         'lr_decay^(restored_step/epoch_steps))')
    ap.add_argument('--lr', type=float, default=None,
                    help='override learning_rate (the shipped reference '
                         'models trained at 0.05; the reference script '
                         'default is 0.1)')
    ap.add_argument('--grad-skip-threshold', type=float, default=None,
                    help='skip updates whose global grad norm exceeds '
                         'this (stability guard, see trainer.'
                         'skip_spike_updates; healthy p99 is ~0.4 at '
                         '3DMatch scale — 4.0 is a safe setting)')
    ap.add_argument('--grad-global-clip', type=float, default=None,
                    help='scale grads down to this global norm when '
                         'exceeded (0 = off): every step contributes a '
                         'bounded update instead of being skipped')
    ap.add_argument('--score-dtype', default=None,
                    choices=['compute', 'float32'],
                    help='detection-head precision (config.score_dtype)')
    ap.add_argument('--score-norm-floor', type=float, default=None,
                    help='floor on the det-head per-cloud max normalizer '
                         '(config.score_norm_floor; 0 = exact reference '
                         'semantics — healthy trained cloud_max is ~50-110 '
                         'so 5.0 never binds on healthy batches while '
                         'bounding the degenerate-batch gradient tail)')
    ap.add_argument('--score-beta-floor', type=float, default=None,
                    help='floor on the det-head per-row channel max '
                         '(config.score_beta_floor; bounds the second '
                         'gradient pole — rows whose channel max sits '
                         'near/below zero; 0.01 damps sub-1%%-of-cloud-max '
                         'rows instead of amplifying them)')
    ap.add_argument('--score-clamp', type=float, default=None,
                    help='upper clamp on the detection score (config.'
                         'score_clamp; bounds the det-loss value '
                         'landscape — healthy trained scores are '
                         '~0.6-0.8, so 3.0 never binds on healthy rows; '
                         '0 = reference)')
    ap.add_argument('--keypts-num', type=int, default=None,
                    help='correspondences sampled per pair (config.'
                         'keypts_num; detector-placement lever)')
    ap.add_argument('--det-loss-weight', type=float, default=None,
                    help='detector loss weight (config.det_loss_weight)')
    ap.add_argument('--safe-radius', type=float, default=None,
                    help='false-negative mask radius in m (config.'
                         'safe_radius)')
    ap.add_argument('--max-points', type=int, default=None,
                    help='override the stacked-pair point capacity')
    ap.add_argument('--dl', type=float, default=None,
                    help='override first_subsampling_dl (e.g. 0.05 to '
                         'train natively at the ETH rescaled geometry, '
                         'test_eth.py:37-39)')
    ap.add_argument('--kp-extent', type=float, default=None,
                    help='override KP_extent (2.0 = ETH rescaling)')
    ap.add_argument('--rescale-kpoints', action='store_true',
                    help='DEVIATION (with --restore across a geometry '
                         'change): stretch the restored kernel-point '
                         'dispositions by the KP_extent*dl ratio. Default '
                         'off = reference parity (the Saver restores '
                         'trained-scale dispositions verbatim, '
                         'utils/tester.py:143-162)')
    ap.add_argument('--neighborhood-limits', default=None,
                    help='comma-separated per-level K_l overriding the '
                         '3DMatch-calibrated defaults (produce with '
                         'scripts/dataset_stats.py on the target corpus)')
    ap.add_argument('--level-capacity-ratios', default=None,
                    help='comma-separated per-level capacity ratios '
                         '(dataset_stats.py output)')
    ap.add_argument('--fdim', type=int, default=None,
                    help='override first_features_dim (smoke tests)')
    ap.add_argument('--dp', type=int, default=0,
                    help='data-parallel over N mesh devices (one fragment '
                         'pair per device; 0 = single-device loop)')
    ap.add_argument('--cached', action='store_true',
                    help='cached-pyramid mode: build each pair pyramid '
                         'once, re-augment on device (d3feat_tpu.data.'
                         'cache) — removes the host input bottleneck on '
                         'few-core hosts')
    ap.add_argument('--max-cached-pairs', type=int, default=None)
    ap.add_argument('--resident', action='store_true',
                    help='device-resident dataset (implies --cached): '
                         'upload all cached pyramids to HBM once, slice '
                         'by index on device — required for good step '
                         'rates on tunneled TPUs (~0.3 MB/step host '
                         'traffic instead of ~40 MB)')
    ap.add_argument('--pool-shards', type=int, default=1,
                    help='resident mode: split the cached pool into N '
                         'equal HBM-resident shards rotated every '
                         '--shard-epochs epochs — trains on pools larger '
                         'than device memory and lowers per-pair '
                         'exposure (memorization guard, RESULTS.md '
                         'incident 3)')
    ap.add_argument('--shard-epochs', type=int, default=2,
                    help='epochs between resident pool shard rotations')
    ap.add_argument('--multihost', action='store_true',
                    help='with --resident --dp N: each host process '
                         'caches only its devices\' pair blocks and the '
                         'global resident arrays are assembled across '
                         'processes (parallel/multihost.py; single-'
                         'process runs exercise the identical code path)')
    ap.add_argument('--val-size', type=int, default=None,
                    help='validation batches per epoch (default: config)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.threedmatch import ThreeDMatchDataset
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.train.trainer import Trainer, create_train_state

    cfg = threedmatch_config()
    if args.steps:
        cfg = cfg.replace(epoch_steps=args.steps)
    if args.max_points:
        cfg = cfg.replace(max_points=args.max_points)
    if args.fdim:
        cfg = cfg.replace(first_features_dim=args.fdim)
    if args.val_size is not None:
        cfg = cfg.replace(validation_size=args.val_size)
    if args.lr is not None:
        cfg = cfg.replace(learning_rate=args.lr)
    if args.grad_skip_threshold is not None:
        cfg = cfg.replace(grad_skip_threshold=args.grad_skip_threshold)
    if args.grad_global_clip is not None:
        cfg = cfg.replace(grad_global_clip=args.grad_global_clip)
    if args.score_dtype is not None:
        cfg = cfg.replace(score_dtype=args.score_dtype)
    if args.score_norm_floor is not None:
        cfg = cfg.replace(score_norm_floor=args.score_norm_floor)
    if args.score_beta_floor is not None:
        cfg = cfg.replace(score_beta_floor=args.score_beta_floor)
    if args.score_clamp is not None:
        cfg = cfg.replace(score_clamp=args.score_clamp)
    if args.keypts_num is not None:
        cfg = cfg.replace(keypts_num=args.keypts_num)
    if args.det_loss_weight is not None:
        cfg = cfg.replace(det_loss_weight=args.det_loss_weight)
    if args.safe_radius is not None:
        cfg = cfg.replace(safe_radius=args.safe_radius)
    if args.dl is not None:
        cfg = cfg.replace(first_subsampling_dl=args.dl)
    if args.kp_extent is not None:
        cfg = cfg.replace(KP_extent=args.kp_extent)
    if args.neighborhood_limits is not None:
        cfg = cfg.replace(neighborhood_limits=tuple(
            int(v) for v in args.neighborhood_limits.split(',')))
    if args.level_capacity_ratios is not None:
        cfg = cfg.replace(level_capacity_ratios=tuple(
            float(v) for v in args.level_capacity_ratios.split(',')))
    save_dir = args.save_dir or time.strftime('results/Log_%m%d%H%M')

    dataset = ThreeDMatchDataset(args.data, cfg.first_subsampling_dl)
    rng = np.random.default_rng(42)
    val_rng = np.random.default_rng(7)

    if args.multihost and not (args.resident and args.dp):
        ap.error('--multihost requires --resident --dp N')
    if args.multihost and args.pool_shards > 1:
        ap.error('--multihost does not compose with --pool-shards yet '
                 '(one resident pool per host)')
    if args.resident:
        args.cached = True
    if args.multihost:
        # deterministic global key order -> identical assignment on every
        # host; this process caches only its devices' blocks
        from d3feat_tpu.data.cache import build_cache_for_keys
        from d3feat_tpu.parallel.multihost import process_pair_assignment
        import time as _t
        keys_all = sorted(dataset.pair_keys['train'])
        local_keys, k_per_dev, local_dev = process_pair_assignment(
            keys_all, args.dp)
        t0 = _t.perf_counter()
        cache = build_cache_for_keys(dataset, 'train', cfg, local_keys)
        print(f'multihost: cached {len(cache)} local pair pyramids '
              f'({k_per_dev}/device x {local_dev} local devices) in '
              f'{_t.perf_counter() - t0:.0f} s', flush=True)
        train_fn = lambda: cache.train_batches(rng)  # noqa: E731
        train_it = cache.train_batches(rng)
    elif args.cached:
        from d3feat_tpu.data.cache import build_cache_from_dataset
        import time as _t
        t0 = _t.perf_counter()
        cache = build_cache_from_dataset(dataset, 'train', cfg,
                                         max_pairs=args.max_cached_pairs,
                                         rng=rng)
        print(f'cached {len(cache)} pair pyramids in '
              f'{_t.perf_counter() - t0:.0f} s', flush=True)
        train_fn = lambda: cache.train_batches(rng)  # noqa: E731
        train_it = cache.train_batches(rng)
    else:
        train_fn = None
        train_it = dataset.train_batches(cfg, rng, 'train')

    first = next(train_it)
    model, variables = init_kpfcnn(cfg, first['pyramid'])
    state = create_train_state(cfg, variables)
    if args.restore:
        from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                                 restore_checkpoint)
        snap = args.restore
        if not os.path.basename(snap.rstrip('/')).startswith('snap-'):
            snap = latest_snapshot(snap)
        print(f'restoring {snap}', flush=True)
        state = restore_checkpoint(snap, state)
        # Cross-geometry fine-tune (e.g. indoor snap -> ETH dl/KP_extent):
        # reference parity keeps the TRAINED-scale dispositions (the
        # Saver restores the kernel_points variable verbatim,
        # utils/tester.py:143-162); --rescale-kpoints is the opt-in
        # deviation that stretches them by the KP_extent*dl ratio
        # (utils/checkpoint.rescale_kpoints).
        snap_params = os.path.join(os.path.dirname(os.path.abspath(snap)),
                                   'parameters.txt')
        if os.path.exists(snap_params):
            from d3feat_tpu.config import Config
            from d3feat_tpu.utils.checkpoint import (geometry_scale,
                                                     rescale_kpoints)
            trained = Config.load(snap_params)
            scale = geometry_scale(trained, cfg)
            if args.rescale_kpoints:
                scaled = rescale_kpoints(state.kpoints, trained, cfg)
                if scaled is not state.kpoints:
                    print(f'DEVIATION: rescaling kpoints, trained '
                          f'KP_extent*dl='
                          f'{trained.KP_extent * trained.first_subsampling_dl}'
                          f' -> {cfg.KP_extent * cfg.first_subsampling_dl}',
                          flush=True)
                    state = state.replace(kpoints=scaled)
            elif abs(scale - 1.0) >= 1e-9:
                print(f'NOTE: cross-geometry restore (KP_extent*dl ratio '
                      f'{scale:.3g}) keeps trained-scale kernel '
                      f'dispositions (reference parity); pass '
                      f'--rescale-kpoints to stretch them to the new '
                      f'geometry', flush=True)
        elif args.rescale_kpoints:
            ap.error(f'--rescale-kpoints needs {snap_params} to read the '
                     f'trained geometry, and it does not exist')
        else:
            print(f'WARNING: {snap_params} missing — cannot check the '
                  f'snapshot geometry against this run\'s config; if the '
                  f'trained KP_extent*dl differs, kernel dispositions '
                  f'will be at the wrong scale', flush=True)
        if args.reset_step:
            import jax.numpy as jnp
            from d3feat_tpu.train.trainer import make_optimizer
            state = state.replace(
                step=jnp.zeros((), jnp.int32),
                opt_state=make_optimizer(cfg).init(state.params))
            print('reset step counter + optimizer state (fine-tune mode)',
                  flush=True)

    if args.resident:
        from d3feat_tpu.train.resident import run_resident_training
        mesh = None
        if args.dp:
            # mesh-sharded resident pool + per-device pairs + ICI grad
            # pmean: D-way throughput and D-way dataset memory
            from d3feat_tpu.parallel import make_mesh
            mesh = make_mesh(args.dp)
        if args.multihost:
            from d3feat_tpu.parallel.multihost import (
                MultiHostResidentSampler)
            pool = MultiHostResidentSampler(cache, k_per_dev, local_dev,
                                            mesh)
        else:
            pool = (cache.split_shards(args.pool_shards, rng)
                    if args.pool_shards > 1 else cache)
        run_resident_training(
            cfg, pool, state, save_dir, rng=rng, epochs=args.epochs,
            restore_snap=snap if args.restore else None,
            shard_epochs=args.shard_epochs, mesh=mesh)
        return

    from d3feat_tpu.data.loader import prefetch
    if args.dp:
        # mesh data parallelism: one fragment pair per device, params
        # replicated, XLA-inserted gradient all-reduce
        import jax as _jax
        from d3feat_tpu.parallel import (make_dp_train_step, make_mesh,
                                         stack_batches)
        mesh = make_mesh(args.dp)
        dp_step = make_dp_train_step(cfg, mesh)
        it = prefetch(lambda: dataset.train_batches(cfg, rng, 'train'))
        steps = (args.epochs or cfg.max_epoch) * cfg.epoch_steps
        for i in range(steps):
            batches = [next(it) for _ in range(args.dp)]
            state, metrics = dp_step(state, stack_batches(batches))
            if i % 100 == 0:
                print(f's{i:06d} loss={float(metrics["total"]):.4f} '
                      f'acc={float(metrics["accuracy"]):.3f}', flush=True)
            if (i + 1) % cfg.epoch_steps == 0:
                from d3feat_tpu.utils.checkpoint import save_checkpoint
                save_checkpoint(os.path.join(
                    save_dir, f'snap-{i // cfg.epoch_steps}'),
                    _jax.device_get(state))
        return

    trainer = Trainer(cfg, save_dir)
    trainer.train(
        state,
        train_batches=train_fn or (lambda: prefetch(
            lambda: dataset.train_batches(cfg, rng, 'train'))),
        val_batches=lambda: dataset.train_batches(cfg, val_rng, 'val'),
        num_epochs=args.epochs)


if __name__ == '__main__':
    main()
