"""Print size/geometry statistics of a fragment set and suggested
static-shape config values.

Replaces the reference's analysis scripts (`datasets/analysis_3dmatch.py`,
`datasets/analysis_eth.py`) and couples them to the offline calibration
(`d3feat_tpu.data.calibration`) so the printed numbers are directly usable
as config overrides.

Usage:
  python scripts/dataset_stats.py --ply-dir DIR [--voxel 0.03] [--limit 20]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ply-dir', required=True)
    ap.add_argument('--voxel', type=float, default=0.03)
    ap.add_argument('--limit', type=int, default=20,
                    help='max fragments to sample')
    ap.add_argument('--kp-extent', type=float, default=None,
                    help='calibrate under this KP_extent (2.0 = the ETH '
                         'rescaled geometry, test_eth.py:37-39)')
    args = ap.parse_args()

    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.calibration import calibrate
    from d3feat_tpu.data.ply import read_ply_points
    from d3feat_tpu.ops.subsample import grid_subsample

    plys = []
    for root, _, files in os.walk(args.ply_dir):
        plys.extend(os.path.join(root, f) for f in files
                    if f.endswith('.ply'))
    plys = sorted(plys)[:args.limit]
    if not plys:
        raise SystemExit(f'no .ply files under {args.ply_dir}')

    clouds = []
    for p in plys:
        raw = read_ply_points(p)
        sub = grid_subsample(raw, args.voxel)
        bbox = sub.max(0) - sub.min(0)
        print(f'{os.path.relpath(p, args.ply_dir)}: {len(raw)} raw -> '
              f'{len(sub)} @ {args.voxel}m, bbox '
              f'{bbox[0]:.2f}x{bbox[1]:.2f}x{bbox[2]:.2f} m')
        clouds.append(sub)

    sizes = np.array([len(c) for c in clouds])
    print(f'\nsubsampled sizes: min {sizes.min()} median '
          f'{int(np.median(sizes))} max {sizes.max()}')

    cfg = threedmatch_config(first_subsampling_dl=args.voxel)
    if args.kp_extent is not None:
        cfg = cfg.replace(KP_extent=args.kp_extent)
    knobs = calibrate(clouds, cfg)
    print('\nsuggested config overrides:')
    for k, v in knobs.items():
        print(f'  {k} = {v}')


if __name__ == '__main__':
    main()
