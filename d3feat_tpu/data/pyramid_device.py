"""On-device multiscale pyramid: raw cloud -> padded pyramid, all in XLA.

Device-side twin of `data/pyramid.build_pyramid` for the dense-inference
path.  The host builder costs ~1.2 s per 100k fragment on one CPU core
(dominated by the native radius searches) while the network forward is
~49 ms on the TPU; building the pyramid on device removes the host from
the extraction loop entirely — a fragment's raw points are shipped once
and everything else happens on the chip.

Geometry semantics are identical to the host builder (same radius
schedule, shadow/padding conventions, int16 rel quantization, calibrated
K per level) and are enforced by golden tests against it
(tests/test_device_grid.py), including an end-to-end check that the
KPFCNN forward produces the same descriptors from either pyramid.

Level economics (one `CellTable` serves three searches): within level l,
conv (queries = points_l), pool (queries = points_{l+1}) and the upsample
into level l-1 (radius 2*r_{l-1} == r_l) all probe supports points_l at
radius r_l, so each level builds exactly one grid index + one compacted
candidate table (see `ops/device_grid.py`).

Static capacities: level point caps come from `config.level_capacities()`
like everywhere else; the two new knobs (occupied-cell count, candidates
per cell) overflow *detectably* — `ok=False` in the result — so callers
retry with `grow()`-style larger caps, mirroring `runtime.tester`'s
bucketed retry.  Single cloud (B == 1), matching the reference tester
which runs one fragment per step (`utils/tester.py:177-233`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from d3feat_tpu.config import Config
from d3feat_tpu.data.pyramid import _layer_plan
from d3feat_tpu.ops.device_grid import (build_cell_table,
                                        grid_subsample_device,
                                        radius_search)


def build_pyramid_device(
    points: jnp.ndarray,
    n_valid: jnp.ndarray,
    config: Config,
    *,
    cell_ratio: float = 0.45,
    cand_cap: int = 160,
) -> Tuple[Dict, jnp.ndarray]:
    """Build the full padded pyramid for one cloud on device.

    Args:
      points: [caps[0], 3] f32 cloud, pad rows at 1e6.
      n_valid: dynamic valid point count.
      config: geometry knobs (same fields the host builder uses).
      cell_ratio: occupied-cell capacity per level as a fraction of the
        level's point capacity (occupancy ~2.8 points/cell on 3DMatch-like
        scans -> ~36% of points are cell-firsts; 0.45 is ~25% headroom).
        Every per-cell cost in the table build scales with this, so keep
        it tight and let the caller's retry ladder grow it.
      cand_cap: max candidates (supports within the surrounding 27 cells)
        per cell (measured mean ~76 on 3DMatch-like scans); scale-free
        across levels because r/dl is constant.

    Returns (pyramid dict pytree — same keys/shapes/dtypes as the host
    `build_pyramid` for B == 1 — and `ok` [3] bool: [0] hard failures
    (grid extent / level point capacity — not growable by the two knobs;
    fall back to the host builder or a wider point bucket), [1] occupied-
    cell overflow (grow `cell_ratio`), [2] candidates-per-cell overflow
    (grow `cand_cap`).  Per-axis flags let the retry ladder grow only the
    knob that overflowed instead of escalating both.
    """
    caps = config.level_capacities()
    limits = config.neighborhood_limits
    num_layers = config.num_layers
    plan = _layer_plan(config.architecture)
    if plan != [True] * (num_layers - 1) + [False]:
        raise NotImplementedError(
            'device pyramid supports the standard strided pyramid '
            f'(every level but the last pools); got plan {plan}')
    if points.shape[0] != caps[0]:
        raise ValueError(f'points capacity {points.shape[0]} != level-0 '
                         f'capacity {caps[0]}')
    host_geom = config.host_geometry

    r = config.first_subsampling_dl * config.KP_extent * 2.5
    dl = config.first_subsampling_dl

    pts = [points]
    ns = [n_valid]
    # per-axis overflow flags (hard = grid/level-capacity, not growable by
    # the (cell_ratio, cand_cap) ladder; cells / cand = the two knobs)
    ok = jnp.array([True, True, True])
    # subsample first so every level's table can seed from its neighbors
    for l in range(num_layers - 1):
        sub, n_sub, sok = grid_subsample_device(
            pts[l], ns[l], 2.0 * dl * (2.0 ** l), caps[l + 1])
        ok = ok.at[0].set(ok[0] & sok)
        pts.append(sub)
        ns.append(n_sub)

    out_points, out_neigh, out_pools, out_ups = [], [], [], []
    out_masks, out_lengths = [], []
    out_rels, out_pool_rels, out_up_rels = [], [], []
    for l in range(num_layers):
        cap = caps[l]
        k_l = limits[l] if l < len(limits) else limits[-1]
        seeds = []
        if plan[l]:
            seeds.append(pts[l + 1])
        if l >= 1:
            seeds.append(pts[l - 1])
        seed_arr = jnp.concatenate(seeds, axis=0) if seeds else None
        table = build_cell_table(
            pts[l], ns[l], r,
            cell_cap=max(int(cap * cell_ratio) // 256 * 256, 256),
            cand_cap=cand_cap,
            seeds=seed_arr)

        conv_i, conv_rel, cok = radius_search(
            table, pts[l], ns[l], r, k_l, with_rel=host_geom)
        ok &= cok
        out_neigh.append(conv_i)
        if host_geom:
            out_rels.append(conv_rel)

        if plan[l]:
            pool_i, pool_rel, pok = radius_search(
                table, pts[l + 1], ns[l + 1], r, k_l, with_rel=host_geom)
            ok &= pok
            out_pools.append(pool_i)
            if host_geom:
                out_pool_rels.append(pool_rel)
        if l >= 1:
            # upsample into level l-1: fine queries, coarse supports;
            # host radius 2*r_{l-1} == r_l (data/pyramid.py)
            with_up_rel = host_geom and config.upsample_k > 1
            up_i, up_rel, uok = radius_search(
                table, pts[l - 1], ns[l - 1], r, config.upsample_k,
                with_rel=with_up_rel)
            ok &= uok
            out_ups.append(up_i)
            if with_up_rel:
                out_up_rels.append(up_rel)

        out_points.append(pts[l])
        out_masks.append(jnp.arange(cap) < ns[l])
        out_lengths.append(ns[l].astype(jnp.int32)[None])
        r *= 2.0

    n0 = n_valid
    cloud_inds = jnp.where(jnp.arange(caps[0]) < n0, 0, 1).astype(jnp.int32)
    feats = jnp.where((jnp.arange(caps[0]) < n0)[:, None],
                      jnp.ones((caps[0], config.in_features_dim),
                               jnp.float32), 0.0)

    out = {
        'points': tuple(out_points),
        'neighbors': tuple(out_neigh),
        'pools': tuple(out_pools),
        'upsamples': tuple(out_ups),
        'masks': tuple(out_masks),
        'lengths': tuple(out_lengths),
        'features': feats,
        'cloud_inds': cloud_inds,
    }
    if host_geom:
        out['rels'] = tuple(out_rels)
        out['pool_rels'] = tuple(out_pool_rels)
        if out_up_rels:
            out['up_rels'] = tuple(out_up_rels)
    return out, ok


def build_pyramid_device_batch(
    points: jnp.ndarray,
    n_valid: jnp.ndarray,
    config: Config,
    *,
    cell_ratio: float = 0.45,
    cand_cap: int = 160,
) -> Tuple[Dict, jnp.ndarray]:
    """B independent cloud pyramids in ONE program (vmap over the
    single-cloud builder).

    Args:
      points: [B, caps[0], 3] f32 clouds, pad rows at 1e6.
      n_valid: [B] dynamic valid counts.

    Returns (pyramid pytree with a leading B axis on every leaf, ok
    [B, 3] bool — the same per-axis overflow flags per cloud).

    Every per-cloud value is identical to `build_pyramid_device` run
    separately: the builder's only non-exact f32 ops are pointwise
    (d2, barycenter divide) or fixed-order (slot-ordered scatter-add),
    so batching does not change results — enforced slot-exactly by
    tests/test_device_grid.py::test_batch_pyramid_matches_single.
    One B-cloud dispatch amortizes the per-dispatch tunnel round trip
    that dominates dense extraction on tunneled TPUs (VERDICT r4 #8);
    semantics stay single-cloud (the reference tester also extracts one
    fragment at a time, `utils/tester.py:177-233` — batching here is
    purely an execution-shape choice).
    """

    def one(p, n):
        return build_pyramid_device(p, n, config, cell_ratio=cell_ratio,
                                    cand_cap=cand_cap)

    return jax.vmap(one)(points, n_valid)
