"""Numpy data augmentation, matching the reference's descriptor datasets.

`datasets/ThreeDMatch.py:24-45,266-273` and `datasets/KITTI.py:191-206`:
  * additive noise: uniform [0, augment_noise) per coordinate — the
    reference uses `np.random.rand(...) * noise` (NOT zero-centered);
  * random rotation about 1 (or all 3) coordinate axes;
  * KITTI extras: isotropic scale in [scale_min, scale_max] and a uniform
    translation in [-shift, shift]^3.

All functions take an explicit numpy Generator for reproducibility.
"""

from __future__ import annotations

import numpy as np


def axis_rotation_matrix(axis: int, theta: float) -> np.ndarray:
    """Rotation about coordinate axis (the reference's template trick,
    `datasets/ThreeDMatch.py:24-35`, reduces to the standard matrices)."""
    c, s = np.cos(theta), np.sin(theta)
    r = np.array([[c, -s, -s], [s, c, -s], [s, s, c]], dtype=np.float32)
    r[:, axis] = 0.0
    r[axis, :] = 0.0
    r[axis, axis] = 1.0
    return r


def random_rotate(points: np.ndarray, rng: np.random.Generator,
                  num_axis: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Rotate about one random axis (num_axis=1) or all three in sequence
    (num_axis=3). Returns (rotated_points, R) with points @ R semantics."""
    if num_axis == 0:
        return points, np.eye(3, dtype=np.float32)
    if num_axis == 1:
        theta = rng.random() * 2 * np.pi
        axis = int(rng.integers(3))
        r = axis_rotation_matrix(axis, theta)
        return points @ r, r
    if num_axis == 3:
        r_total = np.eye(3, dtype=np.float32)
        for axis in (0, 1, 2):
            theta = rng.random() * 2 * np.pi
            r = axis_rotation_matrix(axis, theta)
            r_total = r_total @ r
        return points @ r_total, r_total
    raise ValueError(f'num_axis must be 0, 1 or 3, got {num_axis}')


def augment_cloud(
    points: np.ndarray,
    rng: np.random.Generator,
    *,
    noise: float = 0.005,
    num_axis: int = 1,
    scale_min: float = 1.0,
    scale_max: float = 1.0,
    shift_range: float = 0.0,
) -> np.ndarray:
    """Full augmentation pipeline for one cloud (noise -> rotate -> scale ->
    shift). 3DMatch uses only noise+rotation; KITTI adds scale+shift."""
    pts = points.astype(np.float32)
    if noise > 0:
        pts = pts + rng.random(pts.shape).astype(np.float32) * noise
    pts, _ = random_rotate(pts, rng, num_axis)
    if scale_min != 1.0 or scale_max != 1.0:
        pts = pts * np.float32(rng.uniform(scale_min, scale_max))
    if shift_range > 0:
        pts = pts + rng.uniform(-shift_range, shift_range,
                                size=(1, 3)).astype(np.float32)
    return pts
