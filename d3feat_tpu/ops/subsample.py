"""Voxel-grid barycenter subsampling (host side).

Semantics follow the reference C++ op (`tf_custom_ops/tf_subsampling/
grid_subsampling/grid_subsampling.cpp:46-149` and `cpp_wrappers/
cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-97`):

  * each cloud is quantized on a ``sample_dl`` grid whose origin is the
    cloud's own bbox min corner;
  * the output contains one point per occupied voxel — the barycenter of
    the points that fell in it; optional feature averaging and
    majority-vote labels;
  * per-batch-element independent grids (`batch_grid_subsampling`,
    grid_subsampling.cpp:101-149).

The reference emits voxels in ``unordered_map`` iteration order
(non-deterministic). We emit voxels in order of **first occurrence** in the
input — deterministic, same set of points. Downstream consumers never rely
on voxel order.

This is pure vectorized numpy. A C++ fast path (d3feat_tpu/native) is used
automatically when the compiled extension is available; both implement the
same contract and are covered by the same tests.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def _voxel_keys(points: np.ndarray, sample_dl: float) -> np.ndarray:
    """int64 voxel key per point, grid anchored at the cloud bbox min corner."""
    origin = points.min(axis=0)
    coords = np.floor((points - origin) / sample_dl).astype(np.int64)
    # Collision-free linear key (matches mapIdx = iX + nX*iY + nX*nY*iZ).
    dims = coords.max(axis=0) + 1
    return coords[:, 0] + dims[0] * (coords[:, 1] + dims[1] * coords[:, 2])


def grid_subsample(
    points: np.ndarray,
    sample_dl: float,
    features: Optional[np.ndarray] = None,
    labels: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, ...]:
    """Subsample one cloud; returns (points[, features][, labels]).

    Matches `cpp_wrappers/.../grid_subsampling.cpp:5-97`: barycenter per
    voxel, mean features, majority-vote labels.
    """
    points = np.ascontiguousarray(points, dtype=np.float32)
    if points.shape[0] == 0:
        out = [points]
        if features is not None:
            out.append(features[:0])
        if labels is not None:
            out.append(labels[:0])
        return tuple(out) if len(out) > 1 else out[0]

    if features is None and labels is None:
        from d3feat_tpu import native
        if native.available():
            return native.grid_subsample_native(points, sample_dl)

    keys = _voxel_keys(points, sample_dl)
    # first-occurrence ordering: unique returns sorted keys; remap through
    # the index of each voxel's first point to get a stable deterministic order.
    uniq, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    first_idx = np.full(uniq.shape[0], points.shape[0], dtype=np.int64)
    np.minimum.at(first_idx, inv, np.arange(points.shape[0]))
    order = np.argsort(first_idx, kind='stable')
    rank = np.empty_like(order)
    rank[order] = np.arange(order.shape[0])
    inv = rank[inv]
    counts = counts[order]

    n_vox = uniq.shape[0]
    sums = np.zeros((n_vox, 3), dtype=np.float64)
    np.add.at(sums, inv, points.astype(np.float64))
    sub_points = (sums / counts[:, None]).astype(np.float32)

    out: List[np.ndarray] = [sub_points]
    if features is not None:
        fsums = np.zeros((n_vox, features.shape[1]), dtype=np.float64)
        np.add.at(fsums, inv, features.astype(np.float64))
        out.append((fsums / counts[:, None]).astype(np.float32))
    if labels is not None:
        # majority vote per voxel (SampledData::update_classes semantics)
        lab = np.asarray(labels).reshape(-1)
        classes = np.unique(lab)
        votes = np.zeros((n_vox, classes.shape[0]), dtype=np.int64)
        np.add.at(votes, (inv, np.searchsorted(classes, lab)), 1)
        out.append(classes[np.argmax(votes, axis=1)])
    return tuple(out) if len(out) > 1 else out[0]


def batch_grid_subsample(
    points: np.ndarray,
    lengths: Sequence[int],
    sample_dl: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Subsample a stacked batch of clouds independently.

    Args:
      points: [N, 3] stacked clouds.
      lengths: per-cloud point counts summing to N.
      sample_dl: voxel size.

    Returns:
      (sub_points [M, 3], sub_lengths [B]) — reference op
      `BatchGridSubsampling` (`tf_batch_subsampling.cpp:8-20`).
    """
    out_pts: List[np.ndarray] = []
    out_len: List[int] = []
    start = 0
    for n in lengths:
        sub = grid_subsample(points[start:start + n], sample_dl)
        out_pts.append(sub)
        out_len.append(sub.shape[0])
        start += n
    return (
        np.concatenate(out_pts, axis=0) if out_pts else points[:0],
        np.asarray(out_len, dtype=np.int32),
    )
