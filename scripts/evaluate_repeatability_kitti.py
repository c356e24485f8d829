"""KITTI keypoint-repeatability sweep (reference parity:
`repeatability/evaluate_kitti_our.py:12-64`).

For every KITTI test pair: extract descriptors+scores, keep the top-512
keypoints per cloud by detection score, and sweep repeatability over
k in {4, 8, ..., 512} at the KITTI threshold (0.5 m) against the GT
transform. The reference evaluates its own dumps the same way; here the
extraction is inline because the registration cache only stores top-250
keypoints.

Usage:
  python scripts/evaluate_repeatability_kitti.py --data data/kitti \
      --snapshot results_kitti/Log_synthk_r3 [--threshold 0.5]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/kitti')
    ap.add_argument('--snapshot', required=True)
    ap.add_argument('--threshold', type=float, default=0.5,
                    help='0.5 m is the reference KITTI threshold '
                         '(evaluate_kitti_our.py:40)')
    ap.add_argument('--max-keypts', type=int, default=512)
    ap.add_argument('--batch-frags', type=int, default=2)
    ap.add_argument('--max-pairs', type=int, default=None)
    ap.add_argument('--device-pyramid', action='store_true')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import Config
    from d3feat_tpu.data.kitti import KITTIDataset
    from d3feat_tpu.eval.repeatability import K_SWEEP, keypoint_repeatability
    from d3feat_tpu.models.kpfcnn import init_variables
    from d3feat_tpu.runtime import DescriptorExtractor
    from d3feat_tpu.train.trainer import create_train_state
    from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                             restore_checkpoint)

    cfg = Config.load(os.path.join(args.snapshot, 'parameters.txt'))
    dataset = KITTIDataset(args.data, cfg.first_subsampling_dl)
    state = restore_checkpoint(latest_snapshot(args.snapshot),
                               create_train_state(cfg, init_variables(cfg)))
    variables = {'params': state.params, 'batch_stats': state.batch_stats,
                 'kpoints': state.kpoints}
    extractor = DescriptorExtractor(cfg, variables,
                                    device_pyramid=args.device_pyramid)

    sweeps = {k: [] for k in K_SWEEP}
    n_pairs = 0
    for n, ((drive, t0, t1), anc, pos, trans) in enumerate(
            dataset.test_pairs()):
        if args.max_pairs and n >= args.max_pairs:
            break
        results = (extractor.extract_many([anc, pos],
                                          batch=args.batch_frags)
                   if args.batch_frags > 1
                   else [extractor.extract(c) for c in (anc, pos)])
        # score-descending top keypoints, reference protocol
        kp = []
        for cloud, (_desc, score) in zip((anc, pos), results):
            sel = np.argsort(score)[::-1][:args.max_keypts]
            kp.append(cloud[sel])
        # Reference KITTI quirk (`evaluate_kitti_our.py:16-23`): anc is
        # transformed by the GT and repeatability is counted PER POS
        # keypoint (min over anc rows) — unlike its 3DMatch sibling,
        # which counts per transformed cloud.  d(T a, p) == d(a, T^-1 p),
        # so counting per pos against anc under the inverse transform
        # reproduces it exactly with the shared helper.
        t_inv = np.linalg.inv(trans)
        rep = keypoint_repeatability(kp[1], kp[0], t_inv,
                                     threshold=args.threshold)
        for k, v in rep.items():
            sweeps[k].append(v)
        n_pairs += 1
        print(f'[{n}] {drive}_{t0}_{t1}: ' +
              ' '.join(f'k{k}={rep[k]:.3f}' for k in (64, 256, 512)),
              flush=True)

    print(f'\nKITTI repeatability over {n_pairs} pairs '
          f'(threshold {args.threshold} m):')
    print(' | '.join(f'k={k}' for k in K_SWEEP))
    print(' | '.join(f'{np.mean(sweeps[k]):.4f}' for k in K_SWEEP))


if __name__ == '__main__':
    main()
