"""Multiscale pyramid builder — host side, static output shapes.

TPU-native replacement for the reference's in-graph pipeline
`tf_descriptor_input` (`datasets/common.py:1301-1413`), which calls the C++
neighbor/subsampling ops per tf.data element and produces *dynamic* shapes.
Here the pyramid is built on the host in numpy with the d3feat_tpu geometry
ops and padded to per-level static capacities, so the entire network is one
XLA program compiled once per bucket.

Radius schedule (reference `datasets/common.py:1312,1355-1370`):
    r_l   = first_subsampling_dl * KP_extent * 2.5 * 2^l   (conv + pool)
    dl_{l+1} = 2 * dl_l                                     (subsampling)
    upsample radius = 2 * r_l  (next layer's density)

Padding conventions (consumed by `d3feat_tpu.ops.kpconv` and the model):
  * point pad rows sit at 1e6 (same virtual location as the reference's
    shadow point, `convolution_ops.py:189-191`);
  * neighbor/pool/upsample matrices use shadow index == *capacity* N_l of
    the support level (the extra zero-feature row appended by consumers);
  * `masks[l]` marks valid rows; `lengths[l]` gives per-cloud valid counts;
  * `cloud_inds` maps each level-0 row to its cloud id (pad rows -> B).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.ops.neighbors import (batch_radius_neighbors,
                                      batch_radius_neighbors_rel)
from d3feat_tpu.ops.subsample import batch_grid_subsample

# A pyramid is a plain dict pytree (jit-friendly).
Pyramid = Dict[str, Tuple[np.ndarray, ...]]

_PAD_POS = 1e6


def _layer_plan(architecture: Sequence[str]) -> List[bool]:
    """For each pyramid level, whether it ends with a strided/pool block
    (i.e. has pools/upsamples to the next level). Mirrors the block walk in
    `datasets/common.py:1325-1340`."""
    plan = []
    for block in architecture:
        if 'global' in block or 'upsample' in block:
            break
        if 'pool' in block or 'strided' in block:
            plan.append(True)
    plan.append(False)  # last level: conv (or nothing) only
    return plan


def _pad_points(pts: np.ndarray, cap: int) -> np.ndarray:
    out = np.full((cap, pts.shape[1]), _PAD_POS, dtype=np.float32)
    out[:pts.shape[0]] = pts
    return out


def _pad_inds(inds: np.ndarray, n_rows_cap: int, old_shadow: int,
              new_shadow: int) -> np.ndarray:
    """Pad index matrix rows to capacity and remap the shadow index from the
    dynamic support count to the static support capacity."""
    k = inds.shape[1]
    out = np.full((n_rows_cap, k), new_shadow, dtype=np.int32)
    remapped = np.where(inds == old_shadow, new_shadow, inds)
    out[:inds.shape[0]] = remapped
    return out


def build_pyramid(
    stacked_points: np.ndarray,
    lengths: Sequence[int],
    config: Config,
    features: np.ndarray | None = None,
    with_inverse: bool = False,
) -> Pyramid:
    """Build the padded multiscale pyramid for a stacked batch of clouds.

    Args:
      stacked_points: [N, 3] float32, clouds concatenated.
      lengths: per-cloud point counts (B entries).
      config: geometry knobs (architecture, dl, KP_extent,
        neighborhood_limits, capacities).
      features: optional [N, C_in]; defaults to ones (the reference's
        constant-1 input feature, `datasets/ThreeDMatch.py:316`).

    Returns a dict pytree with keys:
      points, neighbors, pools, upsamples, masks  (tuples over levels)
      lengths (tuple of [B] int32 per level)
      features [N0_cap, C_in], cloud_inds [N0_cap] int32 (pad -> B)
    """
    stacked_points = np.ascontiguousarray(stacked_points, dtype=np.float32)
    lengths = list(int(x) for x in lengths)
    n0 = stacked_points.shape[0]
    assert sum(lengths) == n0, (sum(lengths), n0)
    caps = config.level_capacities()
    limits = config.neighborhood_limits
    num_layers = config.num_layers
    plan = _layer_plan(config.architecture)
    assert len(plan) == num_layers, (plan, num_layers)
    if n0 > caps[0]:
        raise ValueError(
            f'stacked cloud ({n0} pts) exceeds level-0 capacity {caps[0]}; '
            f'raise config.max_points or subsample the input')

    if features is None:
        features = np.ones((n0, config.in_features_dim), dtype=np.float32)

    r = config.first_subsampling_dl * config.KP_extent * 2.5
    dl = config.first_subsampling_dl

    pts, lens = stacked_points, np.asarray(lengths, np.int32)
    out_points, out_neigh, out_pools, out_ups = [], [], [], []
    out_masks, out_lengths = [], []
    out_rels, out_pool_rels, out_up_rels = [], [], []
    out_inv_neigh = []
    host_geom = config.host_geometry

    def _pad_rel(rel: np.ndarray, n_rows_cap: int) -> np.ndarray:
        out = np.full((n_rows_cap,) + rel.shape[1:], 32767, dtype=np.int16)
        out[:rel.shape[0]] = rel
        return out

    for l in range(num_layers):
        cap = caps[l]
        k_l = limits[l] if l < len(limits) else limits[-1]
        n_l = pts.shape[0]
        if n_l > cap:
            raise ValueError(f'level {l}: {n_l} pts exceed capacity {cap}')

        if host_geom:
            conv_i, conv_rel = batch_radius_neighbors_rel(
                pts, pts, lens, lens, r, k_l)
            out_rels.append(_pad_rel(conv_rel, cap))
        else:
            conv_i = batch_radius_neighbors(pts, pts, lens, lens, r, k_l)

        if plan[l]:
            next_dl = 2.0 * dl
            pool_p, pool_b = batch_grid_subsample(pts, lens, next_dl)
            cap_next = caps[l + 1]
            if pool_p.shape[0] > cap_next:
                raise ValueError(
                    f'level {l + 1}: {pool_p.shape[0]} pts exceed capacity '
                    f'{cap_next}')
            if host_geom:
                pool_i, pool_rel = batch_radius_neighbors_rel(
                    pool_p, pts, pool_b, lens, r, k_l)
                out_pool_rels.append(_pad_rel(pool_rel, cap_next))
            else:
                pool_i = batch_radius_neighbors(pool_p, pts, pool_b, lens,
                                                r, k_l)
            if host_geom and config.upsample_k > 1:
                up_i, up_rel = batch_radius_neighbors_rel(
                    pts, pool_p, lens, pool_b, 2.0 * r, config.upsample_k)
                out_up_rels.append(_pad_rel(up_rel, cap))
            else:
                up_i = batch_radius_neighbors(pts, pool_p, lens, pool_b,
                                              2.0 * r, config.upsample_k)
            out_pools.append(
                _pad_inds(pool_i, cap_next, n_l, cap))
            out_ups.append(
                _pad_inds(up_i, cap, pool_p.shape[0], cap_next))
        else:
            pool_p = pts[:0]
            pool_b = lens * 0

        out_points.append(_pad_points(pts, cap))
        out_neigh.append(_pad_inds(conv_i, cap, n_l, cap))
        if with_inverse:
            from d3feat_tpu.ops.gather import inverse_lists
            k_inv = config.inverse_limits()[
                min(l, len(config.inverse_limits()) - 1)]
            out_inv_neigh.append(
                inverse_lists(out_neigh[-1], cap + 1, k_inv))
        mask = np.zeros(cap, dtype=bool)
        mask[:n_l] = True
        out_masks.append(mask)
        out_lengths.append(lens.astype(np.int32))

        pts, lens = pool_p, pool_b
        r *= 2.0
        dl *= 2.0

    b = len(lengths)
    cloud_inds = np.full(caps[0], b, dtype=np.int32)
    start = 0
    for ci, n in enumerate(lengths):
        cloud_inds[start:start + n] = ci
        start += n

    feats = np.zeros((caps[0], features.shape[1]), dtype=np.float32)
    feats[:n0] = features

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
    if with_inverse:
        out['inv_neighbors'] = tuple(out_inv_neigh)
    return out
