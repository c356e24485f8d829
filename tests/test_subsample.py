"""Golden tests for voxel-grid barycenter subsampling.

Oracle: a direct dict-based re-execution of the reference C++ algorithm
(`cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:5-97`).
"""

import numpy as np
import pytest

from d3feat_tpu.ops import batch_grid_subsample, grid_subsample


def oracle_subsample(points, dl):
    origin = points.min(axis=0)
    cells = {}
    for p in points:
        key = tuple(np.floor((p - origin) / dl).astype(int))
        cells.setdefault(key, []).append(p)
    return sorted(tuple(np.mean(v, axis=0).round(5)) for v in cells.values())


def test_matches_oracle(rng):
    pts = rng.random((500, 3)).astype(np.float32)
    sub = grid_subsample(pts, 0.1)
    assert oracle_subsample(pts, 0.1) == sorted(
        tuple(r) for r in np.round(sub, 5))


def test_single_voxel():
    pts = np.array([[0.0, 0, 0], [0.01, 0, 0], [0, 0.01, 0]], np.float32)
    sub = grid_subsample(pts, 1.0)
    assert sub.shape == (1, 3)
    np.testing.assert_allclose(sub[0], pts.mean(axis=0), atol=1e-6)


def test_deterministic_first_occurrence_order(rng):
    pts = rng.random((300, 3)).astype(np.float32)
    a = grid_subsample(pts, 0.2)
    b = grid_subsample(pts, 0.2)
    np.testing.assert_array_equal(a, b)


def test_feature_averaging_and_labels(rng):
    pts = np.array([[0.0, 0, 0], [0.02, 0, 0], [0.9, 0.9, 0.9]], np.float32)
    feats = np.array([[1.0], [3.0], [10.0]], np.float32)
    labels = np.array([2, 2, 7])
    sub, sfeat, slab = grid_subsample(pts, 0.5, features=feats, labels=labels)
    assert sub.shape[0] == 2
    assert {float(f[0]) for f in sfeat} == {2.0, 10.0}
    assert set(slab.tolist()) == {2, 7}


def test_batch_independent_grids(rng):
    a = rng.random((200, 3)).astype(np.float32)
    b = rng.random((150, 3)).astype(np.float32) + 5.0
    stacked = np.concatenate([a, b], axis=0)
    sub, lens = batch_grid_subsample(stacked, [200, 150], 0.1)
    assert lens.shape == (2,)
    assert sub.shape[0] == lens.sum()
    # each element must equal independent subsampling
    sub_a = grid_subsample(a, 0.1)
    sub_b = grid_subsample(b, 0.1)
    np.testing.assert_allclose(sub[:lens[0]], sub_a, atol=1e-6)
    np.testing.assert_allclose(sub[lens[0]:], sub_b, atol=1e-6)


def test_empty_cloud():
    pts = np.zeros((0, 3), np.float32)
    assert grid_subsample(pts, 0.1).shape == (0, 3)


def test_barycenter_in_voxel(rng):
    pts = rng.random((1000, 3)).astype(np.float32)
    dl = 0.25
    sub = grid_subsample(pts, dl)
    origin = pts.min(axis=0)
    # every barycenter lies inside its voxel
    cell = np.floor((sub - origin) / dl)
    lo = origin + cell * dl
    assert np.all(sub >= lo - 1e-5) and np.all(sub <= lo + dl + 1e-5)
