"""Rigid registration from descriptor correspondences (numpy).

Self-contained replacement for the Open3D RANSAC calls in the reference
(`utils/tester.py:305-314`, `demo_registration.py:184-210`,
`geometric_registration/evaluate.py:84-110`): nearest-neighbor feature
matching, 3-point RANSAC with an edge-length compatibility check (the
CorrespondenceCheckerBasedOnEdgeLength + distance checkers of the
reference's Open3D pipeline), and Kabsch refinement over the inliers.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.spatial import cKDTree


def rigid_transform_3d(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares rigid transform (Kabsch): returns 4x4 T with
    T @ [src;1] ~= dst."""
    src_c = src.mean(axis=0)
    dst_c = dst.mean(axis=0)
    h = (src - src_c).T @ (dst - dst_c)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    t = dst_c - r @ src_c
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


def apply_transform(points: np.ndarray, trans: np.ndarray) -> np.ndarray:
    return points @ trans[:3, :3].T + trans[:3, 3]


def match_features(src_desc: np.ndarray, dst_desc: np.ndarray,
                   mutual: bool = False) -> np.ndarray:
    """Nearest-neighbor matches in descriptor space -> [M, 2] indices."""
    tree_dst = cKDTree(dst_desc)
    _, fwd = tree_dst.query(src_desc, k=1, workers=-1)
    if not mutual:
        src_idx = np.arange(len(src_desc))
        return np.stack([src_idx, fwd], axis=1)
    tree_src = cKDTree(src_desc)
    _, bwd = tree_src.query(dst_desc, k=1, workers=-1)
    src_idx = np.arange(len(src_desc))
    keep = bwd[fwd] == src_idx
    return np.stack([src_idx[keep], fwd[keep]], axis=1)


def ransac_registration(
    src_pts: np.ndarray,
    dst_pts: np.ndarray,
    src_desc: np.ndarray,
    dst_desc: np.ndarray,
    distance_threshold: float,
    max_iters: int = 50000,
    edge_length_ratio: float = 0.9,
    n_sample: int = 3,
    seed: int = 0,
    mutual: bool = False,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """RANSAC rigid registration (reference Open3D params:
    `utils/tester.py:305-314` — edge checker 0.9, 50k iterations,
    distance threshold = voxel size).

    Returns (T [4,4], inlier matches [M,2], fitness in [0,1]).
    """
    matches = match_features(src_desc, dst_desc, mutual=mutual)
    if len(matches) < n_sample:
        return np.eye(4), matches[:0], 0.0
    a = src_pts[matches[:, 0]]
    b = dst_pts[matches[:, 1]]
    rng = np.random.default_rng(seed)
    n = len(matches)
    best_inliers = 0
    best_t = np.eye(4)

    # vectorized over batches of hypotheses
    batch = 512
    iters = 0
    thr2 = distance_threshold ** 2
    while iters < max_iters:
        m = min(batch, max_iters - iters)
        iters += m
        samples = rng.integers(0, n, size=(m, n_sample))
        sa = a[samples]                      # [m, 3, 3]
        sb = b[samples]
        # edge-length compatibility checker
        ia, ib = np.triu_indices(n_sample, k=1)
        ea = np.linalg.norm(sa[:, ia] - sa[:, ib], axis=-1)
        eb = np.linalg.norm(sb[:, ia] - sb[:, ib], axis=-1)
        ratio = np.minimum(ea, eb) / (np.maximum(ea, eb) + 1e-12)
        ok = np.all(ratio > edge_length_ratio, axis=1)
        for i in np.nonzero(ok)[0]:
            t = rigid_transform_3d(sa[i], sb[i])
            d2 = np.sum((apply_transform(a, t) - b) ** 2, axis=1)
            inl = int(np.sum(d2 < thr2))
            if inl > best_inliers:
                best_inliers = inl
                best_t = t

    if best_inliers >= n_sample:
        # refine on inliers (one Kabsch pass, like Open3D's final estimate)
        d2 = np.sum((apply_transform(a, best_t) - b) ** 2, axis=1)
        mask = d2 < thr2
        best_t = rigid_transform_3d(a[mask], b[mask])
        d2 = np.sum((apply_transform(a, best_t) - b) ** 2, axis=1)
        mask = d2 < thr2
        inlier_matches = matches[mask]
        fitness = float(mask.mean())
    else:
        inlier_matches = matches[:0]
        fitness = 0.0
    return best_t, inlier_matches, fitness


def transform_error(t_est: np.ndarray, t_gt: np.ndarray
                    ) -> Tuple[float, float]:
    """(RTE meters, RRE degrees) — success criterion RTE<2 ∧ RRE<5
    (`utils/tester.py:329-342`)."""
    rte = float(np.linalg.norm(t_est[:3, 3] - t_gt[:3, 3]))
    cos = (np.trace(t_est[:3, :3].T @ t_gt[:3, :3]) - 1.0) / 2.0
    rre = float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))
    return rte, rre
