"""Fixed-degree radius neighbor search (host side).

Replaces the reference's dynamic-width CPU op `BatchOrderedNeighbors`
(`tf_custom_ops/tf_neighbors/tf_batch_neighbors.cpp:8-30`,
`neighbors/neighbors.cpp:211-332`) whose contract is:

  * per batch element, an independent KD-tree over the support cloud;
  * for each query point, indices of all supports within ``radius``,
    **sorted by distance ascending**;
  * ragged rows padded with the shadow index ``n_supports`` (total stacked
    support count);
  * the matrix is then truncated to the calibrated per-level width
    (`big_neighborhood_filter`, datasets/common.py:399-406).

The TPU-native contract is *fixed degree from the start*: we return exactly
``max_neighbors`` columns (the calibrated limit), so every downstream array
is shape-static. Rows with more in-radius neighbors than ``max_neighbors``
keep the nearest ones (identical to the reference after truncation, because
the reference sorts ascending before truncating).

Implementation: scipy cKDTree ``query`` with ``distance_upper_bound`` —
returns ascending-sorted neighbors and pads with ``n`` exactly like the
reference. The compiled C++ extension (d3feat_tpu/native) is used instead
when available.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from scipy.spatial import cKDTree


def radius_neighbors(
    queries: np.ndarray,
    supports: np.ndarray,
    radius: float,
    max_neighbors: int,
) -> np.ndarray:
    """Single-cloud fixed-degree radius search.

    Returns int32 [n_queries, max_neighbors]; entries with no neighbor are
    the shadow index ``len(supports)`` (reference `OrderedNeighbors`,
    tf_neighbors.cpp:8; shadow semantics neighbors.cpp:319-325).
    """
    queries = np.ascontiguousarray(queries, dtype=np.float32)
    supports = np.ascontiguousarray(supports, dtype=np.float32)
    n_s = supports.shape[0]
    if queries.shape[0] == 0:
        return np.zeros((0, max_neighbors), dtype=np.int32)
    if n_s == 0:
        return np.full((queries.shape[0], max_neighbors), 0, dtype=np.int32)

    from d3feat_tpu import native
    if native.available():
        return native.radius_knn_native(queries, supports, radius,
                                        max_neighbors)

    tree = cKDTree(supports)
    # query(k) sorts ascending and marks misses with index == n_s.
    _, idx = tree.query(
        queries, k=max_neighbors, distance_upper_bound=radius, workers=-1
    )
    if max_neighbors == 1:
        idx = idx[:, None]
    return idx.astype(np.int32)


def batch_radius_neighbors(
    queries: np.ndarray,
    supports: np.ndarray,
    q_lengths: Sequence[int],
    s_lengths: Sequence[int],
    radius: float,
    max_neighbors: int,
) -> np.ndarray:
    """Batched fixed-degree radius search over stacked clouds.

    Matches `BatchOrderedNeighbors` (`tf_batch_neighbors.cpp:8-30`): queries
    of batch element b only see supports of batch element b; indices are
    into the *stacked* support array; shadow index = total stacked support
    count (`neighbors.cpp:296-331`).
    """
    n_s_total = int(np.sum(s_lengths))
    rows = []
    q_start = 0
    s_start = 0
    for nq, ns in zip(q_lengths, s_lengths):
        idx = radius_neighbors(
            queries[q_start:q_start + nq],
            supports[s_start:s_start + ns],
            radius,
            max_neighbors,
        )
        # local shadow (ns) -> global shadow (n_s_total); real -> + s_start
        shadow = idx >= ns
        idx = idx.astype(np.int64) + s_start
        idx[shadow] = n_s_total
        rows.append(idx.astype(np.int32))
        q_start += nq
        s_start += ns
    if not rows:
        return np.zeros((0, max_neighbors), dtype=np.int32)
    return np.concatenate(rows, axis=0)


def batch_radius_neighbors_rel(
    queries: np.ndarray,
    supports: np.ndarray,
    q_lengths: Sequence[int],
    s_lengths: Sequence[int],
    radius: float,
    max_neighbors: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Like :func:`batch_radius_neighbors` but also returns the relative
    vectors (support - query) per slot, quantized to int16 by
    radius/32767 (shadow slots = 32767). These let the device compute
    KPConv influence weights without re-gathering coordinates — the host
    search already touched every neighbor."""
    n_s_total = int(np.sum(s_lengths))
    from d3feat_tpu import native
    use_native = native.available()

    idx_rows, rel_rows = [], []
    q_start = 0
    s_start = 0
    scale = 32767.0 / radius
    for nq, ns in zip(q_lengths, s_lengths):
        q = queries[q_start:q_start + nq]
        s = supports[s_start:s_start + ns]
        if use_native and nq and ns:
            idx, rel = native.radius_knn_rel_native(q, s, radius,
                                                    max_neighbors)
        else:
            idx = radius_neighbors(q, s, radius, max_neighbors)
            rel = np.full((nq, max_neighbors, 3), 32767, dtype=np.int16)
            valid = idx < ns
            if ns and valid.any():
                diff = (s[idx.clip(0, ns - 1)]
                        - q[:, None, :]) * scale
                diff = np.clip(np.rint(diff), -32767, 32767)
                rel = np.where(valid[:, :, None],
                               diff.astype(np.int16), rel)
        shadow = idx >= ns
        gidx = idx.astype(np.int64) + s_start
        gidx[shadow] = n_s_total
        idx_rows.append(gidx.astype(np.int32))
        rel_rows.append(rel)
        q_start += nq
        s_start += ns
    if not idx_rows:
        return (np.zeros((0, max_neighbors), np.int32),
                np.zeros((0, max_neighbors, 3), np.int16))
    return np.concatenate(idx_rows, 0), np.concatenate(rel_rows, 0)


def neighbor_histogram_limit(
    clouds: Sequence[np.ndarray],
    radius: float,
    keep_ratio: float = 0.8,
    hist_max: int = 1024,
) -> int:
    """Offline replacement for the reference's runtime neighbor calibration
    (`datasets/common.py:572-673`): the smallest degree K such that a
    fraction ``keep_ratio`` of neighborhoods (over the sample clouds) have
    <= K in-radius neighbors.
    """
    hist = np.zeros(hist_max + 1, dtype=np.int64)
    for cloud in clouds:
        tree = cKDTree(np.ascontiguousarray(cloud, dtype=np.float32))
        counts = tree.query_ball_point(cloud, r=radius, workers=-1, return_length=True)
        hist += np.bincount(np.minimum(counts, hist_max), minlength=hist_max + 1)
    cum = np.cumsum(hist)
    total = cum[-1]
    if total == 0:
        return 1
    # cum[k] = #neighborhoods with <= k neighbors; smallest k covering the ratio
    return max(int(np.searchsorted(cum, keep_ratio * total)), 1)
