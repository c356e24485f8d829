"""Standalone keypoint-repeatability evaluation over a descriptor dump.

Reference parity: `repeatability/evaluate_3dmatch_our.py` /
`evaluate_kitti_our.py` — for every GT-overlapping pair, the fraction of
top-k keypoints of one fragment with a counterpart of the other within
`threshold` after GT alignment, swept over k in {4, 8, ..., 512}.

Usage:
  python scripts/evaluate_repeatability.py --dump .../D3Feat_tpu \
      --gt gt_result_dir [--threshold 0.1]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dump', required=True)
    ap.add_argument('--gt', required=True)
    ap.add_argument('--threshold', type=float, default=0.10,
                    help='0.1 m for 3DMatch, 0.5 m for KITTI')
    args = ap.parse_args()

    from d3feat_tpu.eval.benchmark_logs import load_log
    from d3feat_tpu.eval.repeatability import K_SWEEP, keypoint_repeatability

    scenes = sorted(os.listdir(os.path.join(args.dump, 'keypoints')))
    sweep_totals = {k: [] for k in K_SWEEP}
    for scene in scenes:
        gt_dir = None
        for cand in (scene, scene + '-evaluation'):
            if os.path.isdir(os.path.join(args.gt, cand)):
                gt_dir = os.path.join(args.gt, cand)
                break
        if gt_dir is None:
            continue
        gt = load_log(os.path.join(gt_dir, 'gt.log'))
        kp_dir = os.path.join(args.dump, 'keypoints', scene)
        keypts = {}
        for f in os.listdir(kp_dir):
            num = int(f.split('_')[-1].split('.')[0])
            # dumps are score-ascending; repeatability wants score-descending
            keypts[num] = np.load(os.path.join(kp_dir, f))[::-1]
        scene_sweeps = {k: [] for k in K_SWEEP}
        for key, trans in gt.items():
            i, j = (int(x) for x in key.split('_'))
            if i not in keypts or j not in keypts:
                continue
            # reference transforms the TARGET (j) onto the source frame
            rep = keypoint_repeatability(keypts[j], keypts[i], trans,
                                         threshold=args.threshold)
            for k, v in rep.items():
                scene_sweeps[k].append(v)
        if scene_sweeps[K_SWEEP[0]]:
            line = ' '.join(f'k={k}:{np.mean(v):.3f}'
                            for k, v in scene_sweeps.items())
            print(f'{scene}: {line}')
            for k, v in scene_sweeps.items():
                sweep_totals[k].append(np.mean(v))
    print('\naverage repeatability:')
    for k, vals in sweep_totals.items():
        if vals:
            print(f'  k={k:4d}: {np.mean(vals):.4f}')


if __name__ == '__main__':
    main()
