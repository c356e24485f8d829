"""Point-to-point ICP (numpy).

Replaces the reference's `open3d.registration.registration_icp` call used
to refine KITTI ground-truth poses (`datasets/KITTI.py:288-297`: threshold
0.2 m, point-to-point, max 200 iterations).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree

from d3feat_tpu.eval.registration import apply_transform, rigid_transform_3d


def icp_point_to_point(
    src: np.ndarray,
    dst: np.ndarray,
    threshold: float = 0.2,
    init: np.ndarray | None = None,
    max_iterations: int = 200,
    tol: float = 1e-7,
) -> np.ndarray:
    """Refine the alignment of src onto dst. Returns 4x4 T."""
    t = np.eye(4) if init is None else init.copy()
    tree = cKDTree(dst)
    prev_err = np.inf
    cur = apply_transform(src, t)
    for _ in range(max_iterations):
        d, idx = tree.query(cur, k=1, workers=-1,
                            distance_upper_bound=threshold)
        mask = np.isfinite(d)
        if mask.sum() < 10:
            break
        step = rigid_transform_3d(cur[mask], dst[idx[mask]])
        t = step @ t
        cur = apply_transform(src, t)
        err = float(np.mean(d[mask] ** 2))
        if abs(prev_err - err) < tol:
            break
        prev_err = err
    return t
