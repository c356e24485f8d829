"""A/B the inverse-list training backward at full training scale.

The backward of each per-level feature gather is natively an XLA
scatter-add; `ops/gather.py` can replace it with a padded inverse-list
gather built on the host (config.train_inverse_gather). Round-1 measured
the inverse SLOWER at demo-pair scale (68.4 vs 49.7 ms/step) with the
default K_inv = 2K padding; this benchmark re-evaluates it at the real
training bucket (max_points, e.g. 65536 stacked points) with a
CALIBRATED K_inv (measured worst in-degree per level + margin) so the
verdict reflects rows actually gathered, not the 2K guess.

Timing uses the chained-steps marginal pattern (the axon tunnel makes
block_until_ready a no-op — see PERF_NOTES.md).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/microbench_invgather.py --data data/synth3dm [--chain 20]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def marginal_step_time(step, state, batch, chain, warm=2):
    """Median per-step time from chained executions: run the train step
    `chain` times re-feeding the updated state, fetch one scalar at the
    end (forces the whole chain), and compare against a 1-step chain."""
    import jax

    def run(n):
        s = state
        m = None
        for _ in range(n):
            s, m = step(s, batch)
        return float(m['total'])

    for _ in range(warm):
        run(1)
    t1 = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(1)
        t1.append(time.perf_counter() - t0)
    tn = []
    for _ in range(3):
        t0 = time.perf_counter()
        run(chain)
        tn.append(time.perf_counter() - t0)
    return (np.median(tn) - np.median(t1)) / (chain - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/synth3dm')
    ap.add_argument('--chain', type=int, default=20)
    ap.add_argument('--kinv-margin', type=float, default=1.25,
                    help='K_inv = ceil(measured worst in-degree * margin) '
                         'rounded up to a lane multiple of 8')
    ap.add_argument('--max-points', type=int, default=None,
                    help='override the pair bucket (CPU smoke tests)')
    ap.add_argument('--fdim', type=int, default=None)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import threedmatch_config as _base_config

    def threedmatch_config(**kw):
        if args.max_points:
            kw.setdefault('max_points', args.max_points)
        if args.fdim:
            kw.setdefault('first_features_dim', args.fdim)
        return _base_config(**kw)
    from d3feat_tpu.data.batching import make_training_batch
    from d3feat_tpu.data.threedmatch import ThreeDMatchDataset
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.ops.gather import inverse_lists
    from d3feat_tpu.train.trainer import create_train_state, make_train_step

    cfg = threedmatch_config()
    dataset = ThreeDMatchDataset(args.data, cfg.first_subsampling_dl)
    rng = np.random.default_rng(0)

    # the largest-available pair exercises the full bucket
    best, best_n = None, -1
    for _ in range(64):
        s = dataset.sample_pair('train', rng)
        if s is None:
            continue
        n = len(s[0]) + len(s[1])
        if best_n < n <= cfg.max_points:
            best, best_n = s, n
    anc, pos, corr = best
    print(f'pair: {len(anc)} + {len(pos)} = {best_n} stacked '
          f'(bucket {cfg.max_points})', flush=True)

    # calibrate K_inv per level from the ACTUAL forward lists of this batch
    probe = make_training_batch(
        anc, pos, corr, threedmatch_config(train_inverse_gather=False),
        rng=np.random.default_rng(1), augment=False)
    kinv = []
    for lvl, lists in enumerate(probe['pyramid']['neighbors']):
        n_rows = probe['pyramid']['points'][lvl].shape[0]
        flat = np.asarray(lists).reshape(-1)
        deg = np.bincount(flat[flat < n_rows], minlength=n_rows)
        k = int(np.ceil(deg.max() * args.kinv_margin))
        kinv.append(-(-k // 8) * 8)
    print(f'calibrated inverse_k = {tuple(kinv)} '
          f'(default would be {threedmatch_config().inverse_limits()})',
          flush=True)

    results = {}
    for name, cfg_run in (
        ('scatter-backward (default)',
         threedmatch_config(train_inverse_gather=False)),
        ('inverse-list backward',
         threedmatch_config(train_inverse_gather=True,
                            inverse_k=tuple(kinv))),
    ):
        batch = make_training_batch(anc, pos, corr, cfg_run,
                                    rng=np.random.default_rng(1),
                                    augment=False)
        model, variables = init_kpfcnn(cfg_run, batch['pyramid'])
        state = create_train_state(cfg_run, variables)
        step = make_train_step(cfg_run)
        dt = marginal_step_time(step, state, batch, args.chain)
        results[name] = dt
        print(f'{name:32s} {dt * 1e3:8.1f} ms/step', flush=True)

    a = results['scatter-backward (default)']
    b = results['inverse-list backward']
    print(f'\nverdict: inverse-list is {b / a:.2f}x the default '
          f'({"KILL" if b >= a else "KEEP"} at this scale)', flush=True)


if __name__ == '__main__':
    main()
