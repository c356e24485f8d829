"""Synthesize an ETH-format outdoor fixture for the zero-shot flow.

The real ETH laser scans (gazebo/wood scenes, `datasets/ETH.py`) are not
obtainable here (zero egress), so this generates outdoor-scale procedural
scenes — undulating terrain, tree-like trunks + canopies, a shed box — in
EXACTLY the layout `ETHDataset` + `eval/eth.py` consume: 4 scene dirs
with `Hokuyo_N.ply` fragments (local frames) and a Choi-format `gt.log`
of overlapping pairs.  Scale matches the ETH protocol: ~20 m extents
voxelized at 0.0625 m (vs 3DMatch's ~4 m at 0.03 m), so the rescaled
kernel geometry (`test_eth.py:37-39`) is actually exercised.

Usage:
  python scripts/make_synthetic_eth.py --out data/synth_eth [--frags 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_synthetic_3dmatch import (_box, _cylinder, _rect, _sphere,  # noqa
                                    random_se3)

ETH_SCENES = ('gazebo_summer', 'gazebo_winter', 'wood_autmn', 'wood_summer')


def make_outdoor_scene(rng, density=120.0):
    """~20x20 m outdoor plot: undulating ground, trees (trunk+canopy),
    one shed. Density is per m^2 (~0.09 m point spacing raw; ~ETH scan
    density after the 0.0625 m voxelization)."""
    w = d = 18.0 + rng.random() * 6.0
    # terrain: jittered grid with a smooth height field
    n_ground = int(w * d * density)
    gx = rng.random(n_ground) * w
    gy = rng.random(n_ground) * d
    gz = (np.sin(gx * 0.31) * 0.4 + np.cos(gy * 0.23) * 0.5
          + np.sin((gx + gy) * 0.11) * 0.3)
    parts = [np.stack([gx, gy, gz], 1)]

    def ground(x, y):
        return (np.sin(x * 0.31) * 0.4 + np.cos(y * 0.23) * 0.5
                + np.sin((x + y) * 0.11) * 0.3)

    n_trees = 12 + int(rng.integers(8))
    for _ in range(n_trees):
        x, y = 1.5 + rng.random() * (w - 3), 1.5 + rng.random() * (d - 3)
        z0 = ground(x, y)
        trunk_h = 2.0 + rng.random() * 3.0
        trunk_r = 0.12 + rng.random() * 0.2
        parts.append(_cylinder(rng, np.array([x, y, z0 + trunk_h / 2]),
                               trunk_r, trunk_h, density * 4))
        canopy_r = 0.8 + rng.random() * 1.5
        parts.append(_sphere(rng, np.array([x, y, z0 + trunk_h + canopy_r
                                            * 0.6]), canopy_r, density))
    # a shed / gazebo structure
    sx, sy = 3 + rng.random() * (w - 6), 3 + rng.random() * (d - 6)
    size = np.array([2.5 + rng.random() * 2, 2.5 + rng.random() * 2,
                     2.2 + rng.random()])
    parts.append(_box(rng, np.array([sx, sy, ground(sx, sy) + size[2] / 2]),
                      size, density * 2))
    pts = np.concatenate(parts).astype(np.float32)
    pts += rng.standard_normal(pts.shape).astype(np.float32) * 0.01
    return pts


def make_scan_fragments(rng, scene, n_frags, min_pts=60000,
                        rmin=11.0, rspread=5.0, max_pts=None):
    """Scanner-pose partial views: range ball (~14 m) + panoramic wedge."""
    lo, hi = scene.min(0), scene.max(0)
    frags = []
    tries = 0
    while len(frags) < n_frags and tries < n_frags * 30:
        tries += 1
        cam = lo + rng.random(3) * (hi - lo)
        cam[2] = scene[:, 2].mean() + 1.6           # tripod height
        direction = rng.standard_normal(3)
        direction[2] *= 0.1
        direction /= np.linalg.norm(direction)
        rel = scene - cam
        dist = np.linalg.norm(rel, axis=1)
        cosang = (rel @ direction) / np.maximum(dist, 1e-9)
        keep = (dist < rmin + rng.random() * rspread) & (cosang > -0.2)
        if keep.sum() < min_pts:
            continue
        if max_pts is not None and keep.sum() > max_pts:
            continue
        frags.append(scene[keep])
    return frags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='data/synth_eth')
    ap.add_argument('--frags', type=int, default=4)
    ap.add_argument('--voxel', type=float, default=0.0625)
    ap.add_argument('--seed', type=int, default=31337)
    ap.add_argument('--train-scenes', type=int, default=0,
                    help='also emit an outdoor TRAINING corpus of N scenes '
                         'in the reference 3DMatch pickle layout under '
                         '--train-out, voxelized at --train-voxel (an '
                         'ETH-native model; the real ETH protocol is '
                         'zero-shot from 3DMatch, but real ETH scans are '
                         'unobtainable here — this closes the '
                         'rescaled-geometry path with a model that can '
                         'actually match outdoor structure)')
    ap.add_argument('--train-frags', type=int, default=6)
    ap.add_argument('--train-out', default='data/synth_eth_train')
    ap.add_argument('--train-voxel', type=float, default=0.05,
                    help='training voxel == the ETH rescaled '
                         'first_subsampling_dl (test_eth.py:37-39)')
    args = ap.parse_args()

    from d3feat_tpu.data.overlap import compute_overlap_and_matches
    from d3feat_tpu.data.ply import write_ply
    from d3feat_tpu.ops.subsample import grid_subsample

    rng = np.random.default_rng(args.seed)
    for scene_name in ETH_SCENES:
        scene_dir = os.path.join(args.out, scene_name)
        os.makedirs(scene_dir, exist_ok=True)
        scene = make_outdoor_scene(rng)
        frags_world = make_scan_fragments(rng, scene, args.frags)
        poses, voxed = [], []
        for k, fw in enumerate(frags_world):
            pose = random_se3(rng)
            local = ((fw - pose[:3, 3]) @ pose[:3, :3]).astype(np.float32)
            write_ply(os.path.join(scene_dir, f'Hokuyo_{k}.ply'),
                      [local], ['x', 'y', 'z'])
            poses.append(pose)
            voxed.append(grid_subsample(fw, args.voxel))
        n_frag = len(frags_world)
        log_lines = []
        for i in range(n_frag):
            for j in range(i + 1, n_frag):
                ov, _ = compute_overlap_and_matches(
                    voxed[j], voxed[i], args.voxel * 1.5)
                if ov <= 0.30:
                    continue
                t_ij = np.linalg.inv(poses[i]) @ poses[j]
                log_lines.append(f'{i}\t{j}\t{n_frag}')
                for row in t_ij:
                    log_lines.append('\t'.join(f'{v:.8e}' for v in row))
        with open(os.path.join(scene_dir, 'gt.log'), 'w') as fh:
            fh.write('\n'.join(log_lines) + '\n')
        print(f'{scene_name}: {len(scene)} scene pts, {n_frag} fragments, '
              f'{len(log_lines) // 5} gt pairs', flush=True)

    if args.train_scenes:
        # Outdoor training corpus: smaller wedges (the stacked anc+pos
        # pair must fit the 65536-point training bucket at 0.05 m voxel)
        # over fresh procedural plots, emitted through the same overlap
        # pipeline + pickle layout as the 3DMatch trainer consumes.
        from d3feat_tpu.data.overlap import generate_training_pairs
        n_val = max(1, args.train_scenes // 8)
        frags, poses = {'train': {}, 'val': {}}, {'train': {}, 'val': {}}
        for s in range(args.train_scenes + n_val):
            split = 'train' if s < args.train_scenes else 'val'
            scene = make_outdoor_scene(rng)
            fw_list = make_scan_fragments(
                rng, scene, args.train_frags, min_pts=12000,
                rmin=5.5, rspread=2.5, max_pts=36000)
            for k, fw in enumerate(fw_list):
                pose = random_se3(rng)
                local = ((fw - pose[:3, 3]) @ pose[:3, :3]).astype(
                    np.float32)
                fid = f'scene{s:02d}_{k}'
                frags[split][fid] = local
                poses[split][fid] = pose
            print(f'train scene {s:02d} [{split}]: {len(fw_list)} '
                  f'fragments', flush=True)
        import pickle
        for split in ('train', 'val'):
            ids = sorted(frags[split])
            cand = [(a, b) for a in ids for b in ids
                    if a < b and a.split('_')[0] == b.split('_')[0]]
            pts_file, kp_file = generate_training_pairs(
                frags[split], poses[split], args.train_out, split=split,
                voxel_size=args.train_voxel,
                match_radius=args.train_voxel * 1.5,
                candidate_pairs=cand)
            with open(kp_file, 'rb') as fh:
                n_pairs = len(pickle.load(fh))
            print(f'{split}: {len(ids)} fragments, {n_pairs} pairs '
                  f'-> {pts_file}', flush=True)
    print('done', flush=True)


if __name__ == '__main__':
    main()
