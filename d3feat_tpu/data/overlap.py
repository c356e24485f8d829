"""Offline training-pair generation for 3DMatch-style fragment sets.

Re-implementation of `datasets/cal_overlap.py` (reference): align training
fragments with their GT poses, voxel-downsample, compute cloud overlap by
nearest-neighbor matching, keep pairs with > 30% overlap, and pickle
  * `3DMatch_{split}_{voxel:.3f}_points.pkl`  — dict id -> [N, 3]
  * `3DMatch_{split}_{voxel:.3f}_keypts.pkl`  — dict "anc@pos" -> [M, 2]
in exactly the format `ThreeDMatchDataset` (and the reference) consumes.

The reference matches with cv2 BFMatcher over coordinates
(`cal_overlap.py:63-90`); a KD-tree radius match is equivalent and faster.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Sequence, Tuple

import numpy as np
from scipy.spatial import cKDTree

from d3feat_tpu.ops.subsample import grid_subsample


def compute_overlap_and_matches(
    pts_a: np.ndarray,
    pts_b: np.ndarray,
    match_radius: float,
) -> Tuple[float, np.ndarray]:
    """(overlap ratio, matches [M, 2]) between two *aligned* clouds.

    Overlap = fraction of A's points with a B point within match_radius
    (`cal_overlap.py:63-101` semantics).
    """
    tree = cKDTree(pts_b)
    d, j = tree.query(pts_a, k=1, workers=-1,
                      distance_upper_bound=match_radius)
    mask = np.isfinite(d)
    matches = np.stack([np.nonzero(mask)[0], j[mask]], axis=1)
    overlap = float(mask.mean()) if len(pts_a) else 0.0
    return overlap, matches


def generate_training_pairs(
    fragments: Dict[str, np.ndarray],       # id -> raw points (scene frame)
    poses: Dict[str, np.ndarray],           # id -> 4x4 camera-to-world
    out_dir: str,
    split: str = 'train',
    voxel_size: float = 0.03,
    match_radius: float = 0.03 * 1.5,
    min_overlap: float = 0.30,
    candidate_pairs: Sequence[Tuple[str, str]] | None = None,
) -> Tuple[str, str]:
    """Build and pickle the training-pair files. Returns the two paths."""
    aligned: Dict[str, np.ndarray] = {}
    for fid, pts in fragments.items():
        t = poses[fid]
        world = pts @ t[:3, :3].T + t[:3, 3]
        aligned[fid] = grid_subsample(world.astype(np.float32), voxel_size)

    ids = sorted(aligned.keys())
    if candidate_pairs is None:
        candidate_pairs = [(a, b) for i, a in enumerate(ids)
                           for b in ids[i + 1:]]

    keypts: Dict[str, np.ndarray] = {}
    for a, b in candidate_pairs:
        overlap, matches = compute_overlap_and_matches(
            aligned[a], aligned[b], match_radius)
        if overlap > min_overlap and len(matches):
            keypts[f'{a}@{b}'] = matches.astype(np.int64)

    os.makedirs(out_dir, exist_ok=True)
    pts_file = os.path.join(out_dir,
                            f'3DMatch_{split}_{voxel_size:.3f}_points.pkl')
    kp_file = os.path.join(out_dir,
                           f'3DMatch_{split}_{voxel_size:.3f}_keypts.pkl')
    with open(pts_file, 'wb') as fh:
        pickle.dump(aligned, fh)
    with open(kp_file, 'wb') as fh:
        pickle.dump(keypts, fh)
    return pts_file, kp_file


def _main():
    """CLI parity with the reference's `datasets/cal_overlap.py` script:
    fragments (.ply) + 4x4 poses (.txt) -> training-pair pickles."""
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--fragments', required=True,
                    help='dir of {id}.ply fragments (camera frame)')
    ap.add_argument('--poses', required=True,
                    help='dir of {id}.txt 4x4 camera-to-world poses')
    ap.add_argument('--out', required=True)
    ap.add_argument('--split', default='train')
    ap.add_argument('--voxel-size', type=float, default=0.03)
    ap.add_argument('--min-overlap', type=float, default=0.30)
    args = ap.parse_args()

    from d3feat_tpu.data.ply import read_ply
    fragments, poses = {}, {}
    for name in sorted(os.listdir(args.fragments)):
        if not name.endswith('.ply'):
            continue
        fid = name[:-4]
        data = read_ply(os.path.join(args.fragments, name))
        fragments[fid] = np.stack([data['x'], data['y'], data['z']], axis=1)
        poses[fid] = np.loadtxt(os.path.join(args.poses, fid + '.txt'),
                                dtype=np.float64).reshape(4, 4)
    pts_file, kp_file = generate_training_pairs(
        fragments, poses, args.out, split=args.split,
        voxel_size=args.voxel_size,
        match_radius=args.voxel_size * 1.5,
        min_overlap=args.min_overlap)
    print(f'wrote {pts_file}\nwrote {kp_file}')


if __name__ == '__main__':
    _main()
