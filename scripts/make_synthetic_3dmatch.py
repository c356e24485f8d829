"""Synthesize a 3DMatch-format corpus for end-to-end training + evaluation.

The real 3DMatch training pickles are not obtainable in this environment
(zero egress; the reference checkout ships no point-cloud data beyond the
two demo fragments). This generator produces a corpus in EXACTLY the
reference's formats so every downstream stage — training pickles
(`datasets/cal_overlap.py` outputs), official test-fragment layout
(`fragments/{scene}/cloud_bin_N.ply`), gt.log / gt.info
(`geometric_registration/gt_result/**`) — runs unchanged on synthetic
indoor scenes:

  * each scene is a procedural room (floor, walls, boxes, cylinders,
    spheres) sampled as a surface point cloud with 3DMatch-like density;
  * fragments are partial views: points inside a camera cone intersected
    with a range ball, each moved into its own local frame by a random
    SE(3) (the ground truth);
  * training pairs + correspondences come from the same overlap pipeline
    as the reference (`d3feat_tpu.data.overlap`, > 30% overlap);
  * test scenes get gt.log (T aligning fragment j onto i: P_i^-1 P_j) and
    gt.info (ElasticReconstruction information matrices: sum of G'G over
    overlap points) for FMR + registration recall.

Usage:
  python scripts/make_synthetic_3dmatch.py --out data/synth3dm \
      [--train-scenes 12] [--val-scenes 1] [--test-scenes 2] [--frags 10]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


# ---------------------------------------------------------------------------
# surface samplers (area-weighted)
# ---------------------------------------------------------------------------

def _rect(rng, origin, u, v, density):
    """Points on a parallelogram origin + a*u + b*v."""
    area = np.linalg.norm(np.cross(u, v))
    n = max(int(area * density), 1)
    a = rng.random(n)[:, None]
    b = rng.random(n)[:, None]
    return origin + a * u + b * v


def _box(rng, center, size, density, rot=None):
    sx, sy, sz = size
    faces = []
    for axis in range(3):
        for sign in (-1.0, 1.0):
            dims = [0, 1, 2]
            dims.remove(axis)
            u = np.zeros(3); u[dims[0]] = size[dims[0]]
            v = np.zeros(3); v[dims[1]] = size[dims[1]]
            o = -np.asarray(size) / 2.0
            o[axis] = sign * size[axis] / 2.0
            o[dims[0]] = -size[dims[0]] / 2.0
            o[dims[1]] = -size[dims[1]] / 2.0
            faces.append(_rect(rng, o, u, v, density))
    pts = np.concatenate(faces)
    if rot is not None:
        pts = pts @ rot
    return pts + center


def _cylinder(rng, center, radius, height, density):
    area = 2 * np.pi * radius * height
    n = max(int(area * density), 1)
    theta = rng.random(n) * 2 * np.pi
    z = (rng.random(n) - 0.5) * height
    pts = np.stack([radius * np.cos(theta), radius * np.sin(theta), z], 1)
    # cap
    n_cap = max(int(np.pi * radius ** 2 * density), 1)
    r = radius * np.sqrt(rng.random(n_cap))
    t = rng.random(n_cap) * 2 * np.pi
    cap = np.stack([r * np.cos(t), r * np.sin(t),
                    np.full(n_cap, height / 2)], 1)
    return np.concatenate([pts, cap]) + center


def _sphere(rng, center, radius, density):
    n = max(int(4 * np.pi * radius ** 2 * density), 1)
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return center + radius * v


def make_scene(rng, density=12000.0):
    """One procedural room as a [N, 3] float32 surface cloud (~0.5-1M pts
    raw; ~3DMatch density after 3 cm voxelization). Extent ~4 x 4 x 2.5 m."""
    w, d, h = 3.0 + rng.random() * 2.0, 3.0 + rng.random() * 2.0, 2.5
    parts = [
        _rect(rng, np.zeros(3), np.array([w, 0, 0]), np.array([0, d, 0]),
              density),                                     # floor
        _rect(rng, np.zeros(3), np.array([w, 0, 0]), np.array([0, 0, h]),
              density),                                     # wall y=0
        _rect(rng, np.zeros(3), np.array([0, d, 0]), np.array([0, 0, h]),
              density),                                     # wall x=0
        _rect(rng, np.array([0, d, 0]), np.array([w, 0, 0]),
              np.array([0, 0, h]), density),                # wall y=d
    ]
    n_obj = 6 + int(rng.integers(6))
    for _ in range(n_obj):
        kind = int(rng.integers(3))
        c = np.array([0.4 + rng.random() * (w - 0.8),
                      0.4 + rng.random() * (d - 0.8),
                      0.0])
        if kind == 0:
            size = 0.3 + rng.random(3) * np.array([1.2, 1.2, 1.0])
            theta = rng.random() * np.pi
            rot = np.array([[np.cos(theta), -np.sin(theta), 0],
                            [np.sin(theta), np.cos(theta), 0],
                            [0, 0, 1.0]])
            c[2] = size[2] / 2
            parts.append(_box(rng, c, size, density, rot))
        elif kind == 1:
            r0, hh = 0.15 + rng.random() * 0.4, 0.4 + rng.random() * 1.0
            c[2] = hh / 2
            parts.append(_cylinder(rng, c, r0, hh, density))
        else:
            r0 = 0.15 + rng.random() * 0.35
            c[2] = r0 + rng.random() * 0.8
            parts.append(_sphere(rng, c, r0, density))
    pts = np.concatenate(parts).astype(np.float32)
    # sensor-ish noise
    pts += rng.standard_normal(pts.shape).astype(np.float32) * 0.004
    return pts


def make_fragments(rng, scene, n_frags, min_pts=40000):
    """Partial views: range ball + view cone from interior camera poses.
    Returns list of world-frame clouds."""
    lo, hi = scene.min(0), scene.max(0)
    frags = []
    tries = 0
    while len(frags) < n_frags and tries < n_frags * 20:
        tries += 1
        cam = lo + rng.random(3) * (hi - lo)
        cam[2] = 1.0 + rng.random() * 0.8
        direction = rng.standard_normal(3)
        direction[2] *= 0.3
        direction /= np.linalg.norm(direction)
        rel = scene - cam
        dist = np.linalg.norm(rel, axis=1)
        cosang = (rel @ direction) / np.maximum(dist, 1e-9)
        keep = (dist < 2.2 + rng.random()) & (cosang > 0.45)
        if keep.sum() < min_pts:
            continue
        frags.append(scene[keep])
    return frags


def random_se3(rng):
    """Uniform-ish random rotation + translation in a +-3 m cube."""
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    r = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    t = np.eye(4)
    t[:3, :3] = r
    t[:3, 3] = (rng.random(3) - 0.5) * 6.0
    return t


def info_matrix(overlap_pts):
    """ElasticReconstruction mrComputeInformationMatrix: Lambda =
    sum_p G' G with G = [I3 | S(p)], S = [[0,z,-y],[-z,0,x],[y,-x,0]]."""
    lam = np.zeros((6, 6))
    x, y, z = overlap_pts[:, 0], overlap_pts[:, 1], overlap_pts[:, 2]
    zero = np.zeros_like(x)
    g = np.zeros((len(x), 3, 6))
    g[:, 0, 0] = g[:, 1, 1] = g[:, 2, 2] = 1.0
    g[:, 0, 3:] = np.stack([zero, z, -y], 1)
    g[:, 1, 3:] = np.stack([-z, zero, x], 1)
    g[:, 2, 3:] = np.stack([y, -x, zero], 1)
    lam = np.einsum('nij,nik->jk', g, g)
    return lam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='data/synth3dm')
    ap.add_argument('--train-scenes', type=int, default=12)
    ap.add_argument('--val-scenes', type=int, default=1)
    ap.add_argument('--test-scenes', type=int, default=2)
    ap.add_argument('--frags', type=int, default=10)
    ap.add_argument('--voxel', type=float, default=0.03)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    from d3feat_tpu.data.overlap import (compute_overlap_and_matches,
                                         generate_training_pairs)
    from d3feat_tpu.data.ply import write_ply
    from d3feat_tpu.ops.subsample import grid_subsample

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    n_total = args.train_scenes + args.val_scenes + args.test_scenes
    split_of = (['train'] * args.train_scenes + ['val'] * args.val_scenes
                + ['test'] * args.test_scenes)

    per_split_frags = {'train': {}, 'val': {}}
    per_split_poses = {'train': {}, 'val': {}}
    test_scene_names = []

    for s in range(n_total):
        split = split_of[s]
        scene = make_scene(rng)
        frags_world = make_fragments(rng, scene, args.frags)
        print(f'scene {s:02d} [{split}]: {len(scene)} pts, '
              f'{len(frags_world)} fragments', flush=True)
        if split in ('train', 'val'):
            for k, fw in enumerate(frags_world):
                pose = random_se3(rng)
                # local = (world - t) @ R  <=>  world = local @ R.T + t
                local = ((fw - pose[:3, 3]) @ pose[:3, :3]).astype(
                    np.float32)
                fid = f'scene{s:02d}_{k}'
                per_split_frags[split][fid] = local
                per_split_poses[split][fid] = pose
        else:
            scene_name = f'synth-scene{s:02d}'
            test_scene_names.append(scene_name)
            frag_dir = os.path.join(args.out, 'fragments', scene_name)
            os.makedirs(frag_dir, exist_ok=True)
            gt_dir = os.path.join(args.out, 'gt_result',
                                  scene_name + '-evaluation')
            os.makedirs(gt_dir, exist_ok=True)
            poses, locals_ = [], []
            for k, fw in enumerate(frags_world):
                pose = random_se3(rng)
                local = ((fw - pose[:3, 3]) @ pose[:3, :3]).astype(
                    np.float32)
                write_ply(
                    os.path.join(frag_dir, f'cloud_bin_{k}.ply'),
                    [local.astype(np.float32)], ['x', 'y', 'z'])
                poses.append(pose)
                locals_.append(local)
            # gt.log + gt.info over overlapping non-identical pairs
            n_frag = len(frags_world)
            voxed = [grid_subsample(fw, args.voxel) for fw in frags_world]
            log_lines, info_lines = [], []
            for i in range(n_frag):
                for j in range(i + 1, n_frag):
                    # overlap in world frame, voxelized like the pickles
                    wi, wj = voxed[i], voxed[j]
                    ov, matches = compute_overlap_and_matches(
                        wj, wi, args.voxel * 1.5)
                    if ov <= 0.30:
                        continue
                    t_ij = np.linalg.inv(poses[i]) @ poses[j]
                    log_lines.append(f'{i}\t{j}\t{n_frag}')
                    for row in t_ij:
                        log_lines.append('\t'.join(f'{v:.8e}' for v in row))
                    # info over the overlapping points of j, in j's frame
                    # (ElasticReconstruction computes it over the second
                    # fragment's overlap points)
                    pts_j_local = ((wj[matches[:, 0]] - poses[j][:3, 3])
                                   @ poses[j][:3, :3])
                    lam = info_matrix(pts_j_local)
                    info_lines.append(f'{i}\t{j}\t{n_frag}')
                    for row in lam:
                        info_lines.append(
                            '\t'.join(f'{v:.6e}' for v in row))
            with open(os.path.join(gt_dir, 'gt.log'), 'w') as fh:
                fh.write('\n'.join(log_lines) + '\n')
            with open(os.path.join(gt_dir, 'gt.info'), 'w') as fh:
                fh.write('\n'.join(info_lines) + '\n')
            print(f'  test scene {scene_name}: '
                  f'{len(log_lines) // 5} gt pairs', flush=True)

    for split in ('train', 'val'):
        if not per_split_frags[split]:
            continue
        ids = sorted(per_split_frags[split])
        cand = [(a, b) for a in ids for b in ids
                if a < b and a.split('_')[0] == b.split('_')[0]]
        pts_file, kp_file = generate_training_pairs(
            per_split_frags[split], per_split_poses[split], args.out,
            split=split, voxel_size=args.voxel,
            match_radius=args.voxel * 1.5, candidate_pairs=cand)
        import pickle
        with open(kp_file, 'rb') as fh:
            n_pairs = len(pickle.load(fh))
        print(f'{split}: {len(ids)} fragments, {n_pairs} pairs '
              f'-> {pts_file}', flush=True)

    with open(os.path.join(args.out, 'test_scenes.txt'), 'w') as fh:
        fh.write('\n'.join(test_scene_names) + '\n')
    print('done', flush=True)


if __name__ == '__main__':
    main()
