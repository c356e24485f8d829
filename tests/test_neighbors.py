"""Tests for fixed-degree radius neighbor search.

Oracle: brute-force O(N^2) distances replicating `neighbors.cpp:211-332`
semantics (ascending sort, shadow = n_supports).
"""

import numpy as np

from d3feat_tpu.ops import batch_radius_neighbors, radius_neighbors
from d3feat_tpu.ops.neighbors import neighbor_histogram_limit


def oracle(queries, supports, radius, k):
    n_s = supports.shape[0]
    out = np.full((queries.shape[0], k), n_s, np.int32)
    for i, q in enumerate(queries):
        d = np.linalg.norm(supports - q, axis=1)
        idx = np.argsort(d, kind='stable')
        idx = idx[d[idx] <= radius][:k]
        out[i, :len(idx)] = idx
    return out


def test_matches_bruteforce(rng):
    q = rng.random((50, 3)).astype(np.float32)
    s = rng.random((200, 3)).astype(np.float32)
    got = radius_neighbors(q, s, 0.3, 16)
    want = oracle(q, s, 0.3, 16)
    # index sets per row must match; order may differ only on exact ties
    for g, w in zip(got, want):
        assert set(g.tolist()) == set(w.tolist())
    # and distances must be ascending with shadows last
    for i, row in enumerate(got):
        valid = row[row < 200]
        d = np.linalg.norm(s[valid] - q[i], axis=1)
        assert np.all(np.diff(d) >= -1e-6)
        n_valid = (row < 200).sum()
        assert np.all(row[n_valid:] == 200)


def test_truncation_keeps_nearest(rng):
    q = rng.random((10, 3)).astype(np.float32)
    s = rng.random((500, 3)).astype(np.float32)
    k_small, k_big = 4, 64
    small = radius_neighbors(q, s, 0.5, k_small)
    big = radius_neighbors(q, s, 0.5, k_big)
    np.testing.assert_array_equal(small, big[:, :k_small])


def test_batch_offsets_and_shadow(rng):
    a_q = rng.random((30, 3)).astype(np.float32)
    b_q = rng.random((20, 3)).astype(np.float32) + 10.0
    a_s = rng.random((40, 3)).astype(np.float32)
    b_s = rng.random((60, 3)).astype(np.float32) + 10.0
    q = np.concatenate([a_q, b_q])
    s = np.concatenate([a_s, b_s])
    got = batch_radius_neighbors(q, s, [30, 20], [40, 60], 0.4, 8)
    assert got.shape == (50, 8)
    # element-0 queries index only element-0 supports (or shadow = 100)
    first = got[:30]
    assert np.all((first < 40) | (first == 100))
    second = got[30:]
    assert np.all(((second >= 40) & (second < 100)) | (second == 100))
    # cross-check against per-element single-cloud search
    solo_b = radius_neighbors(b_q, b_s, 0.4, 8)
    remapped = np.where(solo_b == 60, 100, solo_b + 40)
    np.testing.assert_array_equal(second, remapped)


def test_no_neighbor_rows(rng):
    q = np.array([[100.0, 100, 100]], np.float32)
    s = rng.random((10, 3)).astype(np.float32)
    got = radius_neighbors(q, s, 0.1, 4)
    assert np.all(got == 10)


def test_self_is_first():
    pts = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    got = radius_neighbors(pts, pts, 2.0, 3)
    np.testing.assert_array_equal(got[:, 0], [0, 1, 2])


def test_histogram_limit(rng):
    clouds = [rng.random((300, 3)).astype(np.float32) for _ in range(3)]
    k = neighbor_histogram_limit(clouds, radius=0.2, keep_ratio=0.8)
    # 80% of neighborhoods fit within k
    from scipy.spatial import cKDTree
    counts = np.concatenate([
        cKDTree(c).query_ball_point(c, r=0.2, return_length=True)
        for c in clouds])
    assert (counts <= k).mean() >= 0.8
    assert (counts <= k - 1).mean() < 0.8
