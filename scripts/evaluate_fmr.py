"""Standalone offline FMR / inlier-ratio evaluation over a descriptor dump.

Reference two-stage workflow parity: `test_3dmatch.py` dumps descriptors,
then `geometric_registration/evaluate.py <desc_name> <timestr>` evaluates
them. This is the second stage for dumps produced by
`d3feat_tpu.runtime.generate_descriptors` (or by the reference tester —
the layouts are identical).

Usage:
  python scripts/evaluate_fmr.py --dump geometric_registration/D3Feat_tpu \
      --gt data/gt_result \
      [--num-keypts 250] [--tau1 0.1] [--tau2 0.05]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dump', required=True,
                    help='D3Feat_* directory with descriptors/keypoints/scores')
    default_gt = os.path.join(os.path.dirname(__file__), '..', 'data',
                              'gt_result')
    ap.add_argument('--gt',
                    default=default_gt if os.path.isdir(default_gt) else None,
                    required=not os.path.isdir(default_gt),
                    help='dir with {scene}/gt.log (default: vendored '
                         'data/gt_result)')
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--tau1', type=float, default=0.10)
    ap.add_argument('--tau2', type=float, default=0.05)
    args = ap.parse_args()

    from d3feat_tpu.eval.benchmark_logs import load_log
    from d3feat_tpu.eval.fmr import evaluate_scene_pairs

    scenes = sorted(os.listdir(os.path.join(args.dump, 'descriptors')))
    recalls, ratios = [], []
    for scene in scenes:
        gt_dir = None
        for cand in (scene, scene + '-evaluation'):
            if os.path.isdir(os.path.join(args.gt, cand)):
                gt_dir = os.path.join(args.gt, cand)
                break
        if gt_dir is None:
            print(f'{scene}: no ground truth, skipped')
            continue
        gt = load_log(os.path.join(gt_dir, 'gt.log'))
        desc_dir = os.path.join(args.dump, 'descriptors', scene)
        frags = {}
        for f in os.listdir(desc_dir):
            num = int(f.split('_')[-1].split('.')[0])
            frags[num] = {
                'descriptors': np.load(os.path.join(desc_dir, f)),
                'keypts': np.load(os.path.join(
                    args.dump, 'keypoints', scene, f'cloud_bin_{num}.npy')),
                'scores': np.load(os.path.join(
                    args.dump, 'scores', scene, f'cloud_bin_{num}.npy')),
            }
        pairs = [(int(k.split('_')[0]), int(k.split('_')[1]), t)
                 for k, t in gt.items()]
        stats = evaluate_scene_pairs(frags, pairs,
                                     num_keypts=args.num_keypts,
                                     tau1=args.tau1, tau2=args.tau2)
        recalls.append(stats['recall'])
        ratios.append(stats['inlier_ratio'])
        print(f'{scene}: recall={stats["recall"]:.4f} '
              f'inlier_ratio={stats["inlier_ratio"]:.4f} '
              f'avg_corr={stats["avg_correspondences"]:.1f} '
              f'({int(stats["num_pairs"])} pairs)')
    if recalls:
        print(f'\naverage FMR: {np.mean(recalls):.4f} '
              f'(std {np.std(recalls):.4f})')
        print(f'average inlier ratio: {np.mean(ratios):.4f}')


if __name__ == '__main__':
    main()
