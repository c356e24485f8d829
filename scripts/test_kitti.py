"""KITTI registration test (reference entry: test_kitti.py +
`utils/tester.py:test_kitti`).

Per test pair: extract descriptors, select the top-250 keypoints per cloud
by detection score (or 5000 random, `utils/tester.py:240-244`), register
with feature-matching RANSAC (distance threshold = voxel size, 50k iters),
and score success as RTE < 2 m AND RRE < 5 deg (`utils/tester.py:329-342`).

Usage:
  python scripts/test_kitti.py --data data/kitti --snapshot results_kitti/...
                               [--num-keypts 250] [--random] [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='data/kitti')
    ap.add_argument('--device-pyramid', action='store_true',
                    help='build the multiscale pyramid on the accelerator\n'
                         '(data/pyramid_device.py) instead of the host')
    ap.add_argument('--snapshot', default=None)
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--random', action='store_true',
                    help='5000 random keypoints instead of top-score')
    ap.add_argument('--max-pairs', type=int, default=None)
    ap.add_argument('--cache', default='kitti_test_cache')
    ap.add_argument('--exact', action='store_true',
                    help='bit-stable eval: all-f32 forward + f32 head '
                         '(compute_dtype=float32) for reproducible '
                         'cross-path/cross-checkpoint comparisons')
    ap.add_argument('--batch-frags', type=int, default=2,
                    help='fragments per XLA dispatch (2 = both clouds of '
                         'a pair in one call; 1 = reference-style '
                         'per-fragment extraction)')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import Config, kitti_config
    from d3feat_tpu.data.kitti import KITTIDataset
    from d3feat_tpu.models.kpfcnn import init_variables
    from d3feat_tpu.runtime import DescriptorExtractor
    from d3feat_tpu.train.trainer import create_train_state
    from d3feat_tpu.eval.registration import (ransac_registration,
                                              transform_error)

    if args.snapshot:
        cfg = Config.load(os.path.join(args.snapshot, 'parameters.txt'))
    else:
        cfg = kitti_config()
    if args.exact:
        cfg = cfg.replace(compute_dtype='float32', score_dtype='float32')

    dataset = KITTIDataset(args.data, cfg.first_subsampling_dl)
    variables = init_variables(cfg)
    if args.snapshot:
        from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                                 restore_checkpoint)
        state = restore_checkpoint(latest_snapshot(args.snapshot),
                                   create_train_state(cfg, variables))
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats,
                     'kpoints': state.kpoints}
    extractor = DescriptorExtractor(cfg, variables,
                                    device_pyramid=args.device_pyramid)

    rng = np.random.default_rng(0)
    os.makedirs(args.cache, exist_ok=True)

    rte_list, rre_list, success = [], [], []
    for n, ((drive, t0, t1), anc, pos, trans) in enumerate(
            dataset.test_pairs()):
        if args.max_pairs and n >= args.max_pairs:
            break

        cache_file = os.path.join(args.cache, f'{drive}_{t0}_{t1}.npz')
        if os.path.exists(cache_file):
            data = np.load(cache_file)
            t_est = data['trans']
        else:
            kp, dc = [], []
            results = (extractor.extract_many([anc, pos],
                                              batch=args.batch_frags)
                       if args.batch_frags > 1
                       else [extractor.extract(c) for c in (anc, pos)])
            for cloud, (desc, score) in zip((anc, pos), results):
                if args.random:
                    sel = rng.choice(len(cloud), min(5000, len(cloud)),
                                     replace=False)
                else:
                    sel = np.argsort(score)[-args.num_keypts:]
                kp.append(cloud[sel])
                dc.append(desc[sel])
            t_est, inl, fit = ransac_registration(
                kp[0], kp[1], dc[0], dc[1],
                distance_threshold=cfg.first_subsampling_dl,
                max_iters=50000)
            np.savez(cache_file, trans=t_est, anc_kp=kp[0], pos_kp=kp[1])

        rte, rre = transform_error(t_est, trans)
        ok = rte < 2.0 and rre < 5.0
        rte_list.append(rte)
        rre_list.append(rre)
        success.append(ok)
        print(f'[{n}] {drive}_{t0}_{t1}: RTE {rte:.3f} m RRE {rre:.2f} deg '
              f'{"OK" if ok else "FAIL"}')

    succ = np.asarray(success)
    if len(succ):
        print(f'\nsuccess rate: {succ.mean():.4f} ({succ.sum()}/{len(succ)})')
        if succ.any():
            print(f'RTE (successes): {np.mean(np.asarray(rte_list)[succ]):.4f} m')
            print(f'RRE (successes): {np.mean(np.asarray(rre_list)[succ]):.4f} deg')


if __name__ == '__main__':
    main()
