"""Sweep ETH FMR over every snapshot of an ETH-geometry training run.

One process, one DescriptorExtractor: the per-bucket XLA programs
compile once and are reused for every snapshot (only the `variables`
argument changes), so N snapshots cost N x extraction instead of
N x (compile + extraction) — the subprocess-per-snapshot watcher pays
1-2 min of remote compile per bucket per snapshot, and on HBM-starved
sessions (resident training holding a pool shard) it cannot run at
all.  Run this after (or between) trainings.

Appends one JSON line per snapshot to {log_dir}/eval_fmr.jsonl in the
same record shape as scripts/watch_eval.py.

Usage:
  python scripts/eval_eth_snaps.py --log-dir results/Log_eth_r5 \
      --data data/synth_eth [--every 2] [--device-pyramid]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--log-dir', required=True)
    ap.add_argument('--data', default='data/synth_eth')
    ap.add_argument('--every', type=int, default=1)
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--size-multiple', type=int, default=1024,
                    help='fragment bucket granularity. 1024 = native '
                         'buckets (measured safe at ETH geometry; the '
                         'round-5 sweep ran here); coarse buckets pad '
                         'the largest fragments to 98304, where the '
                         'ETH-K program exceeds compile-time HBM')
    ap.add_argument('--neighborhood-limits', default=None,
                    help='comma-separated per-level K_l overriding the '
                         'trained config (use the EVAL-corpus calibration '
                         'from dataset_stats.py; the fatter train-corpus '
                         'ratios at a 98k bucket can exceed compile-time '
                         'HBM)')
    ap.add_argument('--level-capacity-ratios', default=None)
    ap.add_argument('--device-pyramid', action='store_true')
    ap.add_argument('--out', default='geometric_registration_eth')
    ap.add_argument('--snaps', default=None,
                    help='comma-separated snapshot numbers (default: all '
                         'at the --every stride)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import Config
    from d3feat_tpu.data.eth import ETHDataset
    from d3feat_tpu.eval.eth import evaluate_eth_fmr
    from d3feat_tpu.models.kpfcnn import init_variables
    from d3feat_tpu.runtime import DescriptorExtractor, generate_descriptors
    from d3feat_tpu.train.trainer import create_train_state
    from d3feat_tpu.utils.checkpoint import restore_checkpoint

    cfg = Config.load(os.path.join(args.log_dir, 'parameters.txt'))
    cfg = cfg.replace(dataset='ETH', size_multiple=args.size_multiple)
    if args.neighborhood_limits:
        cfg = cfg.replace(neighborhood_limits=tuple(
            int(k) for k in args.neighborhood_limits.split(',')))
    if args.level_capacity_ratios:
        cfg = cfg.replace(level_capacity_ratios=tuple(
            float(r) for r in args.level_capacity_ratios.split(',')))

    if args.snaps:
        snaps = [int(s) for s in args.snaps.split(',')]
    else:
        snaps = sorted(
            int(n.split('-')[1]) for n in os.listdir(args.log_dir)
            if n.startswith('snap-'))
        snaps = [n for n in snaps if n % args.every == 0]
    print(f'evaluating snaps {snaps} of {args.log_dir}', flush=True)

    dataset = ETHDataset(args.data, 0.0625)
    frags = list(dataset.test_fragments())
    template = create_train_state(cfg, init_variables(cfg))
    extractor = DescriptorExtractor(cfg, {},
                                    device_pyramid=args.device_pyramid)
    out_path = os.path.join(args.log_dir, 'eval_fmr.jsonl')
    path = 'device' if args.device_pyramid else 'host'

    for n in snaps:
        t0 = time.time()
        try:
            state = restore_checkpoint(
                os.path.join(args.log_dir, f'snap-{n}'), template)
        except Exception as e:  # noqa: BLE001 — partial/corrupt snapshot
            print(f'snap-{n}: restore failed ({type(e).__name__}), '
                  f'skipping', flush=True)
            continue
        extractor.variables = {'params': state.params,
                               'batch_stats': state.batch_stats,
                               'kpoints': state.kpoints}
        out_dir = generate_descriptors(extractor, frags, args.out,
                                       f'ethsweep{path}_snap{n}')
        stats = evaluate_eth_fmr(out_dir, args.data,
                                 num_keypts=args.num_keypts)
        rec = {'snap': n,
               'fmr': (None if stats is None
                       else round(stats['__mean__']['recall'], 4)),
               'scenes': {s: {'fmr': round(v['recall'], 4),
                              'inlier_ratio': round(v['inlier_ratio'], 4)}
                          for s, v in (stats or {}).items()
                          if s != '__mean__'},
               'path': path, 'ok': stats is not None,
               'eval_s': round(time.time() - t0, 1)}
        with open(out_path, 'a') as fh:
            fh.write(json.dumps(rec) + '\n')
        print(f'snap-{n}: FMR={rec["fmr"]} ({rec["eval_s"]}s)', flush=True)


if __name__ == '__main__':
    main()
