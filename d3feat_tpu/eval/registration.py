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


def rigid_transform_3d_batch(src: np.ndarray, dst: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """Batched Kabsch over [m, k, 3] sample sets -> (R [m,3,3], t [m,3])."""
    src_c = src.mean(axis=1, keepdims=True)
    dst_c = dst.mean(axis=1, keepdims=True)
    h = np.einsum('mki,mkj->mij', src - src_c, dst - dst_c)
    u, _, vt = np.linalg.svd(h)
    v = np.transpose(vt, (0, 2, 1))
    ut = np.transpose(u, (0, 2, 1))
    d = np.sign(np.linalg.det(v @ ut))
    d[d == 0] = 1.0
    v = v.copy()
    v[:, :, 2] *= d[:, None]
    r = v @ ut
    t = dst_c[:, 0, :] - np.einsum('mij,mj->mi', r, src_c[:, 0, :])
    return r, t


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

    # fully vectorized over batches of hypotheses: batched Kabsch over
    # every sample surviving the edge checker, then batched residual
    # scoring in chunks sized to keep the [m, n, 3] residual tensor small
    batch = 512
    iters = 0
    thr2 = distance_threshold ** 2
    ia, ib = np.triu_indices(n_sample, k=1)
    score_chunk = max(1, int(4_000_000 // max(n, 1)))
    while iters < max_iters:
        m = min(batch, max_iters - iters)
        iters += m
        samples = rng.integers(0, n, size=(m, n_sample))
        sa = a[samples]                      # [m, 3, 3]
        sb = b[samples]
        # edge-length compatibility checker
        ea = np.linalg.norm(sa[:, ia] - sa[:, ib], axis=-1)
        eb = np.linalg.norm(sb[:, ia] - sb[:, ib], axis=-1)
        ratio = np.minimum(ea, eb) / (np.maximum(ea, eb) + 1e-12)
        ok = np.all(ratio > edge_length_ratio, axis=1)
        if not np.any(ok):
            continue
        rs, ts = rigid_transform_3d_batch(sa[ok], sb[ok])
        for lo in range(0, len(rs), score_chunk):
            r_c = rs[lo:lo + score_chunk]
            t_c = ts[lo:lo + score_chunk]
            pred = np.einsum('mij,nj->mni', r_c, a) + t_c[:, None, :]
            inl = np.count_nonzero(
                np.sum((pred - b) ** 2, axis=-1) < thr2, axis=1)
            i = int(np.argmax(inl))
            if inl[i] > best_inliers:
                best_inliers = int(inl[i])
                best_t = np.eye(4)
                best_t[:3, :3] = r_c[i]
                best_t[:3, 3] = t_c[i]

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
