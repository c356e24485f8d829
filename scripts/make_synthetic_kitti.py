"""Synthesize a KITTI-odometry-format corpus for end-to-end KITTI runs.

The real KITTI velodyne data is not obtainable in this environment (zero
egress). This generator writes the exact layout `d3feat_tpu.data.kitti.
KITTIDataset` (and the reference `datasets/KITTI.py:82-133`) consumes:

    {out}/sequences/{seq:02d}/velodyne/{frame:06d}.bin   (x,y,z,refl f32)
    {out}/sequences/{seq:02d}/calib.txt                  (Tr: velo->cam)
    {out}/poses/{seq:02d}.txt                            (cam poses, 3x4)
    {out}/config/{train,val,test}_kitti.txt              (sequence lists)

Each sequence is a drive through a procedural outdoor world (ground
plane with height noise, building walls, boxes, poles) sampled like a
spinning lidar: points within a range ball of the car position, in the
velodyne frame. Frames are spaced so the reference's >=10 m pair rule
(`datasets/KITTI.py:82-115`) yields several pairs per sequence.

Usage:
  python scripts/make_synthetic_kitti.py --out data/synthkitti \
      [--train-seqs 4] [--val-seqs 1] [--test-seqs 1] [--frames 12]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def make_world(rng, length=260.0, width=60.0):
    """Outdoor strip along +x: ground + walls + boxes + poles."""
    parts = []
    n_g = int(length * width * 14)
    ground = np.stack([
        rng.random(n_g) * length,
        rng.random(n_g) * width - width / 2,
        rng.normal(0.0, 0.04, n_g)], 1)
    parts.append(ground)
    # building walls parallel to the road
    for side in (-1.0, 1.0):
        x0 = 0.0
        while x0 < length - 20.0:
            seg = 12.0 + rng.random() * 25.0
            y = side * (width / 2 - 2.0 - rng.random() * 6.0)
            h = 4.0 + rng.random() * 8.0
            n_w = int(seg * h * 22)
            parts.append(np.stack([
                x0 + rng.random(n_w) * seg,
                np.full(n_w, y) + rng.normal(0.0, 0.03, n_w),
                rng.random(n_w) * h], 1))
            x0 += seg + 5.0 + rng.random() * 15.0
    # boxes (parked cars / dumpsters)
    for _ in range(int(length / 12)):
        cx = rng.random() * length
        cy = rng.random() * (width - 16.0) - (width - 16.0) / 2
        sx, sy, sz = 2 + rng.random() * 3, 1.5 + rng.random(), \
            1.2 + rng.random() * 1.3
        n_b = int((sx * sy + sx * sz + sy * sz) * 2 * 24)
        u = rng.random((n_b, 3))
        face = rng.integers(0, 3, n_b)
        u[np.arange(n_b), face] = np.round(u[np.arange(n_b), face])
        parts.append(u * [sx, sy, sz] + [cx - sx / 2, cy - sy / 2, 0.0])
    # poles
    for _ in range(int(length / 15)):
        cx, cy = rng.random() * length, \
            rng.random() * (width - 8) - (width - 8) / 2
        n_p = 220
        parts.append(np.stack([
            np.full(n_p, cx) + rng.normal(0, 0.02, n_p),
            np.full(n_p, cy) + rng.normal(0, 0.02, n_p),
            rng.random(n_p) * 6.0], 1))
    return np.concatenate(parts).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='data/synthkitti')
    ap.add_argument('--train-seqs', type=int, default=4)
    ap.add_argument('--val-seqs', type=int, default=1)
    ap.add_argument('--test-seqs', type=int, default=1)
    ap.add_argument('--frames', type=int, default=12)
    ap.add_argument('--step-m', type=float, default=4.0,
                    help='car travel per frame (>=10 m pairs need ~3 '
                         'frames apart)')
    ap.add_argument('--range-m', type=float, default=50.0)
    ap.add_argument('--falloff-r0', type=float, default=12.0,
                    help='lidar density falloff: keep probability '
                         'min(1, (r0/r)^2), matching the ~1/r^2 areal '
                         'return density of a spinning scanner; real '
                         'KITTI lands at ~15-25k pts per frame after '
                         'the 0.30 m voxel (set <=0 to disable)')
    ap.add_argument('--length', type=float, default=260.0,
                    help='world length in m (shrink for smoke tests)')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    # velodyne -> camera axes permutation (x_cam = -y_velo, y_cam =
    # -z_velo, z_cam = x_velo), the standard KITTI Tr shape
    velo2cam = np.eye(4)
    velo2cam[:3, :3] = np.array(
        [[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)

    rng = np.random.default_rng(args.seed)
    n_total = args.train_seqs + args.val_seqs + args.test_seqs
    split_of = (['train'] * args.train_seqs + ['val'] * args.val_seqs
                + ['test'] * args.test_seqs)
    per_split = {'train': [], 'val': [], 'test': []}

    os.makedirs(os.path.join(args.out, 'poses'), exist_ok=True)
    os.makedirs(os.path.join(args.out, 'config'), exist_ok=True)
    for seq in range(n_total):
        split = split_of[seq]
        per_split[split].append(seq)
        world = make_world(rng, length=args.length)
        vdir = os.path.join(args.out, 'sequences', f'{seq:02d}',
                            'velodyne')
        os.makedirs(vdir, exist_ok=True)
        with open(os.path.join(args.out, 'sequences', f'{seq:02d}',
                               'calib.txt'), 'w') as fh:
            tr = ' '.join(str(v) for v in velo2cam[:3, :4].reshape(-1))
            fh.write('P0: 1 0 0 0 0 1 0 0 0 0 1 0\n')
            fh.write(f'Tr: {tr}\n')
        poses = []
        for frame in range(args.frames):
            x = args.step_m * frame + 20.0
            # small heading/position noise so GT is a real SE(3), not a
            # pure translation
            yaw = rng.normal(0.0, 0.02)
            c, s = np.cos(yaw), np.sin(yaw)
            r_w2v = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
            t = np.array([x, rng.normal(0.0, 0.3), 1.7])
            local = (world - t) @ r_w2v.T
            r_xy = np.linalg.norm(local[:, :2], axis=1)
            keep = r_xy < args.range_m
            if args.falloff_r0 > 0:
                # areal return density of a spinning scanner falls off
                # ~1/r^2; without this the flat 14 pts/m^2 world
                # saturates every 0.30 m voxel out to full range and
                # frames come out 3x denser than real KITTI
                p = np.minimum(
                    1.0, (args.falloff_r0 / np.maximum(r_xy, 1e-3)) ** 2)
                keep &= rng.random(len(world)) < p
            pts = local[keep].astype(np.float32)
            refl = np.zeros((len(pts), 1), np.float32)
            np.hstack([pts, refl]).astype(np.float32).tofile(
                os.path.join(vdir, f'{frame:06d}.bin'))
            # camera pose: world = R_v2w local + t; cam = velo2cam T_velo
            # velo2cam^-1 (the adapter inverts this chain)
            t_velo = np.eye(4)
            t_velo[:3, :3] = r_w2v.T
            t_velo[:3, 3] = t
            cam = velo2cam @ t_velo @ np.linalg.inv(velo2cam)
            poses.append(cam[:3].reshape(-1))
            if frame == 0:
                print(f'seq {seq:02d} [{split}]: frame cloud '
                      f'~{len(pts)} pts', flush=True)
        np.savetxt(os.path.join(args.out, 'poses', f'{seq:02d}.txt'),
                   np.asarray(poses))
    for split, seqs in per_split.items():
        with open(os.path.join(args.out, 'config',
                               f'{split}_kitti.txt'), 'w') as fh:
            fh.write('\n'.join(f'{s:02d}' for s in seqs) + '\n')
    print('sequence splits:', {k: v for k, v in per_split.items()},
          flush=True)


if __name__ == '__main__':
    main()
