"""Geometric matchability ceiling of a descriptor dump's keypoints.

The FMR protocol (`geometric_registration/evaluate.py:160-230`) counts a
mutual-nearest descriptor match (anc_kp[i], pos_kp[j]) as an inlier when
the two keypoints are within tau1 = 0.10 m after the GT transform.  The
CEILING on any descriptor's inlier ratio for a pair is therefore set by
the keypoint geometry alone: how many of the top-k keypoints of A have
*any* top-k keypoint of B within tau1 (a perfect descriptor could match
at most those).  This separates "the detector puts keypoints in
non-overlapping / non-repeating spots" (geometry cap) from "the
descriptor cannot tell them apart" (descriptor gap).

Reports per pair: ceiling (one-sided NN coverage within tau1), and the
eval-level ceiling-FMR = fraction of pairs whose ceiling exceeds tau2
(0.05) — the FMR a perfect descriptor would get on these keypoints.

Usage:
  python scripts/keypoint_ceiling.py --dump geometric_registration/D3Feat_x \
      --gt data/synth3dm_eval/gt_result [--scene-map evalNN=sceneNN ...]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def read_gt_log(path):
    pairs = []
    with open(path) as fh:
        lines = [l.split() for l in fh if l.strip()]
    for i in range(0, len(lines), 5):
        anc, pos = int(lines[i][0]), int(lines[i][1])
        mat = np.array([[float(x) for x in lines[i + r]]
                        for r in range(1, 5)])
        pairs.append((anc, pos, mat))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dump', required=True)
    ap.add_argument('--gt', required=True,
                    help='gt_result dir ({scene}-evaluation/gt.log)')
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--tau1', type=float, default=0.10)
    ap.add_argument('--tau2', type=float, default=0.05)
    ap.add_argument('--scene-map', nargs='*', default=[],
                    help='dumpname=gtname renames (e.g. '
                         'synth-eval00=synth-scene00)')
    ap.add_argument('--random-k', action='store_true',
                    help='use k RANDOM points instead of the top-k by '
                         'score: isolates the detector from the overlap '
                         'geometry (the dump keypoints files hold the '
                         'full voxelized cloud, score-ascending)')
    args = ap.parse_args()
    k = args.num_keypts
    remap = dict(m.split('=') for m in args.scene_map)
    rng = np.random.default_rng(0)

    from scipy.spatial import cKDTree

    ceilings, per_scene = [], {}
    for scene in sorted(os.listdir(os.path.join(args.dump, 'keypoints'))):
        gt_scene = remap.get(scene, scene)
        gt_path = os.path.join(args.gt, gt_scene + '-evaluation', 'gt.log')
        if not os.path.exists(gt_path):
            print(f'{scene}: no gt at {gt_path}, skipped')
            continue
        kdir = os.path.join(args.dump, 'keypoints', scene)
        sc = []
        for anc, pos, mat in read_gt_log(gt_path):
            ka = np.load(os.path.join(kdir, f'cloud_bin_{anc}.npy'))
            kp = np.load(os.path.join(kdir, f'cloud_bin_{pos}.npy'))
            if args.random_k:
                ka = ka[rng.choice(len(ka), k, replace=False)]
                kp = kp[rng.choice(len(kp), k, replace=False)]
            else:
                ka, kp = ka[-k:], kp[-k:]
            # gt.log convention (verified in eval/eth.py round 3): mat
            # maps pos -> anc frame
            kp_in_anc = kp @ mat[:3, :3].T + mat[:3, 3]
            d, _ = cKDTree(kp_in_anc).query(ka, k=1)
            sc.append(float((d < args.tau1).mean()))
        per_scene[scene] = sc
        ceilings.extend(sc)
        print(f'{scene}: n={len(sc)} ceiling mean={np.mean(sc):.3f} '
              f'median={np.median(sc):.3f} min={np.min(sc):.3f}')
    c = np.asarray(ceilings)
    print(f'\npairs: {len(c)}')
    print(f'ceiling inlier-ratio: mean {c.mean():.3f}  median '
          f'{np.median(c):.3f}  p10 {np.percentile(c, 10):.3f}')
    print(f'ceiling FMR (ceiling > tau2={args.tau2}): '
          f'{(c > args.tau2).mean():.3f}')


if __name__ == '__main__':
    main()
