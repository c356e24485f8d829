"""Golden tests: on-device grid geometry vs the host implementations.

The device ops (`ops/device_grid.py`, `data/pyramid_device.py`) must
reproduce the host geometry (`ops/neighbors.py`, `ops/subsample.py`,
`data/pyramid.py`) which is itself golden-tested against numpy
re-executions of the reference C++ (`tests/test_neighbors.py`,
`tests/test_subsample.py`).  Comparisons are slot-exact except where
documented: equal f32 distances may order differently when host and
device round the squared distance differently (~1e-5 of slots on real
data), so neighbor-list checks accept rows that match as *sets*.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.pyramid import build_pyramid
from d3feat_tpu.data.pyramid_device import build_pyramid_device
from d3feat_tpu.ops.device_grid import (build_cell_table,
                                        grid_subsample_device,
                                        radius_search)
from d3feat_tpu.ops.neighbors import (batch_radius_neighbors_rel,
                                      radius_neighbors)
from d3feat_tpu.ops.subsample import grid_subsample


def surface_cloud(n_raw=40000, extent=3.0, seed=0, voxel=0.03):
    rng = np.random.default_rng(seed)
    uv = rng.random((n_raw, 2)) * extent
    z = (np.sin(uv[:, 0] * 1.7) * 0.4 + np.cos(uv[:, 1] * 1.3) * 0.3
         + rng.normal(0, 0.01, n_raw))
    pts = np.stack([uv[:, 0], uv[:, 1], z], 1).astype(np.float32)
    return grid_subsample(pts, voxel)


def pad_to(pts, cap):
    out = np.full((cap, 3), 1e6, np.float32)
    out[:pts.shape[0]] = pts
    return out


def rows_equal_or_same_set(dev, host, shadow_d, shadow_h):
    """Slot-exact comparison. Since the candidate table carries original
    indices and the search sorts by (d2, original index) — the host's
    packed (d2_bits << 32 | index) order exactly — every row must match
    slot for slot, equidistant ties included (round-3 tightening of the
    round-2 tie-tolerant check)."""
    exact = (dev == host).all(axis=1)
    bad = np.where(~exact)[0]
    return len(bad) == 0, (bad[0] if len(bad) else -1)


@pytest.fixture(scope='module')
def cloud():
    return surface_cloud()


def test_subsample_matches_host(cloud):
    n = cloud.shape[0]
    cap = 8192
    sub_d, n_sub, ok = jax.jit(
        lambda p, nn: grid_subsample_device(p, nn, 0.06, cap)
    )(jnp.asarray(pad_to(cloud, n)), jnp.int32(n))
    sub_h = grid_subsample(cloud, 0.06)
    assert bool(ok)
    assert int(n_sub) == sub_h.shape[0]
    d = np.asarray(sub_d)[:int(n_sub)]
    # same voxel set, key-sorted vs first-occurrence order: compare sorted
    d = d[np.lexsort(d.T)]
    h = sub_h[np.lexsort(sub_h.T)]
    np.testing.assert_allclose(d, h, atol=1e-5)
    assert (np.asarray(sub_d)[int(n_sub):] == 1e6).all()


def test_conv_search_matches_host(cloud):
    n = cloud.shape[0]
    cap = -(-n // 1024) * 1024
    r, k = 0.075, 38
    pad = pad_to(cloud, cap)
    idx_d, rel_d, ok = jax.jit(lambda p, nn: radius_search(
        build_cell_table(p, nn, r, cell_cap=cap // 2, cand_cap=160),
        p, nn, r, k, with_rel=True))(jnp.asarray(pad), jnp.int32(n))
    assert bool(ok.all())
    idx_h = radius_neighbors(cloud, cloud, r, k)
    idx_h = np.where(idx_h >= n, cap, idx_h)
    good, row = rows_equal_or_same_set(np.asarray(idx_d)[:n], idx_h,
                                       cap, cap)
    assert good, f'row {row} differs beyond tie order'
    assert (np.asarray(idx_d)[n:] == cap).all()
    _, rel_h = batch_radius_neighbors_rel(cloud, cloud, [n], [n], r, k)
    rel_d = np.asarray(rel_d)[:n].astype(np.int32)
    # int16 quantization may differ by 1 quantum where host/device rint
    # disagree at .5 boundaries; shadow slots must agree exactly
    same_slot = np.asarray(idx_d)[:n] == idx_h
    assert np.abs(rel_d - rel_h.astype(np.int32))[same_slot].max() <= 1


def test_cross_level_searches_match_host(cloud):
    """Pool (coarse queries / fine supports) and upsample (fine queries /
    coarse supports at 2r, k=1) against the host search."""
    n = cloud.shape[0]
    cap = -(-n // 1024) * 1024
    r, k = 0.075, 38
    sub = grid_subsample(cloud, 0.06)
    n2 = sub.shape[0]
    cap2 = -(-n2 // 1024) * 1024
    pad, pad2 = pad_to(cloud, cap), pad_to(sub, cap2)

    pool_d, _, ok = jax.jit(lambda p, nn, q, nq: radius_search(
        build_cell_table(p, nn, r, cell_cap=cap // 2, cand_cap=160,
                         seeds=q, n_seeds=nq),
        q, nq, r, k))(jnp.asarray(pad), jnp.int32(n),
                      jnp.asarray(pad2), jnp.int32(n2))
    assert bool(ok.all())
    pool_h = radius_neighbors(sub, cloud, r, k)
    pool_h = np.where(pool_h >= n, cap, pool_h)
    good, row = rows_equal_or_same_set(np.asarray(pool_d)[:n2], pool_h,
                                       cap, cap)
    assert good, f'pool row {row} differs beyond tie order'

    up_d, _, ok = jax.jit(lambda p, nn, q, nq: radius_search(
        build_cell_table(p, nn, 2 * r, cell_cap=cap2, cand_cap=192,
                         seeds=q, n_seeds=nq),
        q, nq, 2 * r, 1))(jnp.asarray(pad2), jnp.int32(n2),
                          jnp.asarray(pad), jnp.int32(n))
    assert bool(ok.all())
    up_h = radius_neighbors(cloud, sub, 2 * r, 1)
    up_h = np.where(up_h >= n2, cap2, up_h)
    assert (np.asarray(up_d)[:n] == up_h).mean() > 0.9999


def test_overflow_is_flagged_not_silent(cloud):
    n = cloud.shape[0]
    cap = -(-n // 1024) * 1024
    pad = pad_to(cloud, cap)
    # cell_cap far below the occupied-cell count
    _, _, ok = jax.jit(lambda p, nn: radius_search(
        build_cell_table(p, nn, 0.075, cell_cap=256, cand_cap=160),
        p, nn, 0.075, 8))(jnp.asarray(pad), jnp.int32(n))
    ok = np.asarray(ok)
    assert ok[0] and not ok[1]   # only the CELLS axis tripped
    # cand_cap far below the 27-cell candidate count
    _, _, ok = jax.jit(lambda p, nn: radius_search(
        build_cell_table(p, nn, 0.075, cell_cap=cap, cand_cap=8),
        p, nn, 0.075, 8))(jnp.asarray(pad), jnp.int32(n))
    ok = np.asarray(ok)
    assert ok[0] and ok[1] and not ok[2]   # only the CAND axis tripped


def test_device_pyramid_matches_host(cloud):
    n = cloud.shape[0]
    cfg = threedmatch_config(size_multiple=1024,
                            max_points=-(-n // 1024) * 1024)
    caps = cfg.level_capacities()
    dp, ok = jax.jit(lambda p, nn: build_pyramid_device(p, nn, cfg))(
        jnp.asarray(pad_to(cloud, caps[0])), jnp.int32(n))
    assert bool(ok.all())
    hp = build_pyramid(cloud, [n], cfg)
    assert [int(np.asarray(x)[0]) for x in dp['lengths']] == \
        [int(x[0]) for x in hp['lengths']]
    for dm, hm in zip(dp['masks'], hp['masks']):
        assert (np.asarray(dm) == hm).all()
    # level 0 shares the input order -> exact
    good, row = rows_equal_or_same_set(
        np.asarray(dp['neighbors'][0]), hp['neighbors'][0],
        caps[0], caps[0])
    assert good, f'L0 conv row {row}'
    # deeper levels: same barycenter sets (order is key-sorted vs
    # first-occurrence)
    for l in range(1, cfg.num_layers):
        nl = int(np.asarray(dp['lengths'][l])[0])
        d = np.asarray(dp['points'][l])[:nl]
        h = hp['points'][l][:nl]
        np.testing.assert_allclose(d[np.lexsort(d.T)], h[np.lexsort(h.T)],
                                   atol=1e-5)


@pytest.mark.slow
def test_forward_equal_from_either_pyramid(cloud):
    """KPFCNN descriptors/scores must not depend on which pyramid built
    the inputs (f32 compute isolates geometry from bf16 noise)."""
    from d3feat_tpu.models import init_kpfcnn
    n = cloud.shape[0]
    cfg = threedmatch_config(size_multiple=1024,
                            max_points=-(-n // 1024) * 1024,
                            compute_dtype='float32')
    caps = cfg.level_capacities()
    dp, ok = jax.jit(lambda p, nn: build_pyramid_device(p, nn, cfg))(
        jnp.asarray(pad_to(cloud, caps[0])), jnp.int32(n))
    assert bool(ok.all())
    hp = build_pyramid(cloud, [n], cfg)
    model, variables = init_kpfcnn(cfg, hp)
    fwd = jax.jit(lambda v, p: model.apply(v, p, training=False))
    fh, sh = fwd(variables, hp)
    fd, sd = fwd(variables, jax.tree.map(np.asarray, dp))
    np.testing.assert_allclose(np.asarray(fd)[:n], np.asarray(fh)[:n],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(sd)[:n], np.asarray(sh)[:n],
                               atol=2e-5)


@pytest.mark.slow
def test_extractor_device_pyramid_matches_host(cloud):
    """DescriptorExtractor(device_pyramid=True) must agree with the host
    path through the public extract() surface."""
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.runtime import DescriptorExtractor
    n = cloud.shape[0]
    cfg = threedmatch_config(compute_dtype='float32')
    hp = build_pyramid(cloud, [n],
                       cfg.replace(max_points=-(-n // 1024) * 1024,
                                   size_multiple=1024))
    _, variables = init_kpfcnn(cfg.replace(max_points=hp['features']
                                           .shape[0]), hp)
    host = DescriptorExtractor(cfg, variables)
    dev = DescriptorExtractor(cfg, variables, device_pyramid=True)
    dh, sh = host.extract(cloud)
    dd, sd = dev.extract(cloud)
    assert len(dev.timer) == 1      # the device path actually ran
    np.testing.assert_allclose(dd, dh, atol=2e-5)
    np.testing.assert_allclose(sd, sh, atol=2e-5)


@pytest.mark.slow
def test_extractor_grows_only_overflowed_axis(cloud):
    """A dense cluster overflows only the candidates-per-cell cap: the
    retry ladder must grow the cand axis alone (not cells), remember the
    winning rung for the bucket, and still match the host path."""
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.runtime import DescriptorExtractor
    rng = np.random.default_rng(3)
    # ~400 points inside one 7.5 cm ball -> candidates/cell lands between
    # rung 0 (240) and the top rung (512) so the ladder must grow exactly
    # once on the cand axis; occupied-cell count stays tiny; plus a
    # sparse shell for scale
    dense = rng.normal(0.0, 0.015, (400, 3)).astype(np.float32)
    # 0.4 m extent, displaced 1 m from the cluster so the two point sets
    # share no 27-cell neighborhood; ~5^3 occupied 7.5 cm cells keeps the
    # rung-0 cell cap clear, so ONLY the cand axis trips (400 in the
    # cluster's cells: between rung 0 = 240 and the top rung = 512)
    shell = (rng.random((1600, 3)).astype(np.float32) - 0.5) * 0.4 + 1.0
    pts = np.concatenate([dense, shell])
    # ratio 1.0: the sparse shell barely subsamples, so the default
    # tight per-level ratios would overflow the HOST comparison build
    cfg = threedmatch_config(compute_dtype='float32',
                             level_capacity_ratio=1.0,
                             level_capacity_ratios=())
    hp = build_pyramid(pts, [len(pts)],
                       cfg.replace(max_points=2048, size_multiple=1024))
    _, variables = init_kpfcnn(cfg.replace(max_points=2048), hp)
    host = DescriptorExtractor(cfg, variables)
    dev = DescriptorExtractor(cfg, variables, device_pyramid=True)
    dd, sd = dev.extract(pts)
    cap = 2048
    assert dev._rung[cap][1] > 0, 'cand axis should have grown'
    assert dev._rung[cap][0] == 0, 'cells axis should NOT have grown'
    dh, sh = host.extract(pts)
    np.testing.assert_allclose(dd, dh, atol=2e-5)
    np.testing.assert_allclose(sd, sh, atol=2e-5)
    # rung memory: the next same-bucket extract starts at the winning rung
    compiled_before = len(dev._fns)
    dev.extract(pts)
    assert len(dev._fns) == compiled_before


@pytest.mark.slow
def test_extract_many_device_matches_single(cloud):
    """Device-pyramid extract_many (pipelined dispatches + stacked fetch)
    returns bit-identical results to per-fragment extract — same XLA
    program, only the fetch pattern changes."""
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.runtime import DescriptorExtractor
    n = cloud.shape[0]
    cfg = threedmatch_config(compute_dtype='float32')
    hp = build_pyramid(cloud, [n],
                       cfg.replace(max_points=-(-n // 1024) * 1024,
                                   size_multiple=1024))
    _, variables = init_kpfcnn(cfg.replace(max_points=hp['features']
                                           .shape[0]), hp)
    dev = DescriptorExtractor(cfg, variables, device_pyramid=True)
    frags = [cloud, cloud[: n - 200], cloud[100:]]
    singles = [dev.extract(p) for p in frags]
    batched = dev.extract_many(frags, batch=3)
    for (d1, s1), (d2, s2) in zip(singles, batched):
        np.testing.assert_array_equal(d2, d1)
        np.testing.assert_array_equal(s2, s1)


@pytest.mark.slow
def test_batch_pyramid_matches_single(cloud):
    """The one-program B-cloud pyramid (vmap over the single-cloud
    builder) must be slot-exact vs B separate builds: every non-exact
    f32 op in the builder is pointwise or fixed-order, so batching may
    not change a single slot."""
    from d3feat_tpu.data.pyramid_device import build_pyramid_device_batch
    cfg = threedmatch_config()
    cap = cfg.level_capacities()[0]
    frags = [cloud, cloud[:cloud.shape[0] - 311], cloud[57:]]
    stacked = np.stack([pad_to(f, cap) for f in frags])
    ns = np.array([len(f) for f in frags], np.int32)
    bp, bok = jax.jit(lambda p, n: build_pyramid_device_batch(
        p, n, cfg, cell_ratio=0.45, cand_cap=240))(stacked, ns)
    assert np.asarray(bok).all()
    for j, f in enumerate(frags):
        sp, sok = jax.jit(lambda p, n: build_pyramid_device(
            p, n, cfg, cell_ratio=0.45, cand_cap=240))(
                pad_to(f, cap), np.int32(len(f)))
        assert np.asarray(sok).all()
        flat_b = jax.tree.leaves(jax.tree.map(lambda x: x[j], bp))
        flat_s = jax.tree.leaves(sp)
        for xb, xs in zip(flat_b, flat_s):
            np.testing.assert_array_equal(np.asarray(xb), np.asarray(xs))


@pytest.mark.slow
def test_extract_many_batch_program_matches_single(cloud):
    """batch_program=True runs a chunk as ONE vmapped B-cloud program.
    On CPU in f32 the results are bit-identical to per-fragment extract;
    on TPU bf16 the vmapped forward re-tiles MXU contractions and lands
    in the documented cross-program ulp class (tester.py docstring)."""
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.runtime import DescriptorExtractor
    n = cloud.shape[0]
    cfg = threedmatch_config(compute_dtype='float32')
    hp = build_pyramid(cloud, [n],
                       cfg.replace(max_points=-(-n // 1024) * 1024,
                                   size_multiple=1024))
    _, variables = init_kpfcnn(cfg.replace(max_points=hp['features']
                                           .shape[0]), hp)
    dev = DescriptorExtractor(cfg, variables, device_pyramid=True,
                              batch_program=True)
    frags = [cloud, cloud[: n - 200], cloud[100:]]
    batched = dev.extract_many(frags, batch=3)
    assert any(isinstance(k, tuple) and k[0] == 'devb'
               for k in dev._fns), 'the B-cloud program should have run'
    singles = [dev.extract(p) for p in frags]
    for (d1, s1), (d2, s2) in zip(singles, batched):
        np.testing.assert_allclose(d2, d1, atol=2e-5)
        np.testing.assert_allclose(s2, s1, atol=2e-5)


def test_device_pyramid_matches_host_kitti_geometry():
    """Outdoor KITTI geometry: 0.30 m voxel, ~100 m extent, ground plane +
    vertical structures (the grid must handle tall z-columns and the
    1024-cell/axis bound)."""
    from d3feat_tpu.config import kitti_config
    rng = np.random.default_rng(3)
    # road plane 120 x 24 m + a few 'buildings' (vertical walls)
    road = np.stack([rng.random(30000) * 120.0,
                     rng.random(30000) * 24.0 - 12.0,
                     rng.normal(0, 0.05, 30000)], 1).astype(np.float32)
    walls = []
    for wx in (20.0, 60.0, 95.0):
        walls.append(np.stack([
            np.full(4000, wx) + rng.normal(0, 0.05, 4000),
            rng.random(4000) * 20.0 - 10.0,
            rng.random(4000) * 8.0], 1).astype(np.float32))
    cloud_k = grid_subsample(np.concatenate([road] + walls), 0.30)
    n = cloud_k.shape[0]
    cfg = kitti_config(size_multiple=1024, max_points=-(-n // 1024) * 1024)
    caps = cfg.level_capacities()
    dp, ok = jax.jit(lambda p, nn: build_pyramid_device(p, nn, cfg))(
        jnp.asarray(pad_to(cloud_k, caps[0])), jnp.int32(n))
    assert bool(ok.all())
    hp = build_pyramid(cloud_k, [n], cfg)
    assert [int(np.asarray(x)[0]) for x in dp['lengths']] == \
        [int(x[0]) for x in hp['lengths']]
    good, row = rows_equal_or_same_set(
        np.asarray(dp['neighbors'][0]), hp['neighbors'][0],
        caps[0], caps[0])
    assert good, f'KITTI L0 conv row {row}'
