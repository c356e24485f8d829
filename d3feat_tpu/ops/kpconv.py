"""Kernel Point Convolution — pure-JAX (XLA) formulation.

Faithful re-expression of the reference graph op `KPConv_ops`
(`kernels/convolution_ops.py:161-255`) over *fixed-degree, shadow-padded*
neighbor matrices, as one fused einsum chain that XLA maps onto the MXU:

  1. gather neighbor coords; the shadow row (index == n_support) reads a
     virtual point at 1e6 (`convolution_ops.py:189-191`), pushing its
     influence weight to zero for linear/gaussian influence;
  2. center on the query point; squared distances to the K kernel points;
  3. influence weights: constant / linear ``max(1 - sqrt(d^2+1e-10) /
     (2*KP_extent), 0)`` / gaussian sigma = 0.3*extent
     (`convolution_ops.py:207-224`) — note the reference's linear influence
     reaches zero at d = 2*KP_extent, not KP_extent;
  4. optional 'closest' mode: one-hot of the nearest kernel point
     (`convolution_ops.py:227-232`);
  5. gather neighbor features with a zero shadow row; weight and apply the
     [K, C_in, C_out] kernel tensor;
  6. **D3Feat density normalization** (`convolution_ops.py:249-253`): divide
     by the number of neighbors whose feature-sum is strictly positive
     (clamped to >= 1) — the paper's density-invariance term.

This module holds both the float32 oracle (`kpconv`, golden-tested against
a numpy re-execution of the reference) and the optimized XLA fast path.
A fully fused Pallas kernel was prototyped and abandoned: Mosaic's
`tpu.dynamic_gather` is single-vreg only, so an in-VMEM vector row-gather
is not expressible and the XLA gather path wins (see PERF_NOTES.md).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def f32_exact_precision(*operands) -> jax.lax.Precision | None:
    """HIGHEST iff every operand is f32, else None (backend default).

    TPU MXUs execute f32 contractions at DEFAULT precision by rounding the
    inputs to bf16 (one pass) — the rounding pattern depends on XLA's
    tiling/fusion choices, so the "f32" forward produced ~2e-2-relative
    discrepancies BETWEEN PROGRAM SHAPES (single- vs multi-fragment
    extraction compiled at different capacities) while CPU goldens stayed
    bit-green. Forcing HIGHEST on f32 operands makes compute_dtype=
    'float32' genuinely f32 on-chip (the bit-faithfulness invariant the
    golden tests assert on CPU) at the documented f32-path cost; bf16
    operands keep the native single-pass MXU path (None == DEFAULT)."""
    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return None


def unary_conv(features: jax.Array, weights: jax.Array,
               dtype=None) -> jax.Array:
    """1x1 convolution = matmul (`kernels/convolution_ops.py:90-99`).

    `dtype` is the compute dtype: bf16 casts the operands explicitly —
    bit-identical to what the MXU's DEFAULT precision did implicitly to
    f32 operands, but stated in the program so f32 operands always mean
    exact-f32 (HIGHEST) contractions."""
    if dtype is not None:
        features = features.astype(dtype)
        weights = weights.astype(dtype)
    return jnp.dot(features, weights, preferred_element_type=jnp.float32,
                   precision=f32_exact_precision(features, weights))


@partial(jax.jit, static_argnames=('kp_influence', 'aggregation_mode'))
def kpconv(
    query_points: jax.Array,      # [Nq, 3]
    support_points: jax.Array,    # [Ns, 3]
    neighbor_inds: jax.Array,     # [Nq, K_n] int32, shadow == Ns
    features: jax.Array,          # [Ns, C_in]
    kernel_points: jax.Array,     # [P, 3]
    kernel_weights: jax.Array,    # [P, C_in, C_out]
    kp_extent: float,
    kp_influence: str = 'linear',
    aggregation_mode: str = 'sum',
) -> jax.Array:
    """Rigid KPConv over fixed-degree padded neighborhoods.

    Returns [Nq, C_out] float32.
    """
    n_s = support_points.shape[0]
    p = kernel_points.shape[0]

    # Shadow support row at 1e6 (convolution_ops.py:189-191).
    supports_ext = jnp.concatenate(
        [support_points, jnp.full((1, support_points.shape[1]), 1e6,
                                  dtype=support_points.dtype)], axis=0)
    neigh_xyz = supports_ext[neighbor_inds]                    # [Nq, K_n, 3]
    rel = neigh_xyz - query_points[:, None, :]                 # [Nq, K_n, 3]

    # Squared distances to each kernel point: ||rel||^2 - 2 rel.kp + ||kp||^2
    # (expanded form avoids materializing [Nq, K_n, P, 3]). The dim-3
    # contraction must run at full f32: on the MXU's default bf16 path the
    # rounding error makes near-zero sq_dist negative -> sqrt() = NaN.
    sq_rel = jnp.sum(rel * rel, axis=-1)                       # [Nq, K_n]
    cross = jnp.einsum('nkd,pd->nkp', rel, kernel_points,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    sq_kp = jnp.sum(kernel_points * kernel_points, axis=-1)    # [P]
    sq_dist = jnp.maximum(
        sq_rel[:, :, None] - 2.0 * cross + sq_kp[None, None, :], 0.0)

    if kp_influence == 'constant':
        weights = jnp.ones_like(sq_dist)
    elif kp_influence == 'linear':
        weights = jnp.maximum(
            1.0 - jnp.sqrt(sq_dist + 1e-10) / (2.0 * kp_extent), 0.0)
    elif kp_influence == 'gaussian':
        sigma = kp_extent * 0.3
        weights = jnp.exp(-sq_dist / (2.0 * sigma * sigma + 1e-9))
    else:
        raise ValueError(f'unknown KP_influence: {kp_influence}')

    if aggregation_mode == 'closest':
        nearest = jnp.argmin(sq_dist, axis=2)                  # [Nq, K_n]
        weights = weights * jax.nn.one_hot(nearest, p, dtype=weights.dtype)
    elif aggregation_mode != 'sum':
        raise ValueError(f'unknown aggregation mode: {aggregation_mode}')

    # Zero shadow feature row (convolution_ops.py:234-237).
    feats_ext = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), dtype=features.dtype)],
        axis=0)
    neigh_feats = feats_ext[neighbor_inds]                     # [Nq, K_n, C]

    # [Nq, P, C] then [Nq, C_out] — both land on the MXU.
    weighted = jnp.einsum('nkp,nkc->npc', weights, neigh_feats,
                          preferred_element_type=jnp.float32,
                          precision=f32_exact_precision(weights,
                                                        neigh_feats))
    out = jnp.einsum('npc,pco->no', weighted, kernel_weights,
                     preferred_element_type=jnp.float32,
                     precision=f32_exact_precision(weighted,
                                                   kernel_weights))

    # Density normalization (convolution_ops.py:249-253): count neighbors
    # with strictly positive feature-sum.
    feat_sum = jnp.sum(neigh_feats, axis=-1)                   # [Nq, K_n]
    neighbor_num = jnp.sum((feat_sum > 0.0).astype(out.dtype), axis=-1)
    neighbor_num = jnp.maximum(neighbor_num, 1.0)
    return out / neighbor_num[:, None]


# ---------------------------------------------------------------------------
# Fast path: per-level shared geometry + lane-padded gather tables.
#
# Measured on TPU v5e (100k pts, K=38): the XLA row-gather is the hot spot
# and is *layout-bound*, not bandwidth-bound — gathering rows padded to 128
# lanes is ~2x faster than 32-lane rows, and fusing the influence-weight
# einsum over the padded gather costs nothing extra. The fast path therefore:
#   * computes influence weights ONCE per (level, index-matrix) and shares
#     them across all KPConvs of that level (requires per-level — not
#     per-conv — kernel dispositions; a documented deviation from the
#     reference's per-conv random rotations, `convolution_ops.py:137-148`);
#   * gathers features from a [Ns+1, 128·ceil(C/128)] zero-padded bf16
#     table; the shadow row (index Ns) is zeros;
#   * runs both contraction einsums in bf16 with f32 accumulation.
# `kpconv` above remains the exact-f32 oracle; parity is covered by tests.
# ---------------------------------------------------------------------------

LANE = 128


def influence_weights(
    query_points: jax.Array,     # [Nq, 3]
    support_points: jax.Array,   # [Ns, 3]
    neighbor_inds: jax.Array,    # [Nq, K]
    kernel_points: jax.Array,    # [P, 3]
    kp_extent: float,
    kp_influence: str = 'linear',
    aggregation_mode: str = 'sum',
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Geometry-only influence weights [Nq, P, K], shared by every KPConv
    using the same (level, index-matrix). Same math as steps 1-4 of
    `kpconv` (`convolution_ops.py:189-232`).

    Layout note: the P axis comes *before* K. TPU tiles the two minor dims
    to (sublane, 128-lane); with P=15 minor the array would inflate ~8.5x
    in HBM (15 -> 128 lanes), with K=38 minor only ~3.4x.
    """
    p = kernel_points.shape[0]
    supports_ext = jnp.concatenate(
        [support_points, jnp.full((1, support_points.shape[1]), 1e6,
                                  dtype=support_points.dtype)], axis=0)
    neigh_xyz = supports_ext[neighbor_inds]
    rel = neigh_xyz - query_points[:, None, :]
    sq_rel = jnp.sum(rel * rel, axis=-1)                        # [Nq, K]
    cross = jnp.einsum('nkd,pd->npk', rel, kernel_points,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    sq_kp = jnp.sum(kernel_points * kernel_points, axis=-1)
    sq_dist = jnp.maximum(
        sq_rel[:, None, :] - 2.0 * cross + sq_kp[None, :, None], 0.0)

    if kp_influence == 'constant':
        weights = jnp.ones_like(sq_dist)
    elif kp_influence == 'linear':
        weights = jnp.maximum(
            1.0 - jnp.sqrt(sq_dist + 1e-10) / (2.0 * kp_extent), 0.0)
    elif kp_influence == 'gaussian':
        sigma = kp_extent * 0.3
        weights = jnp.exp(-sq_dist / (2.0 * sigma * sigma + 1e-9))
    else:
        raise ValueError(f'unknown KP_influence: {kp_influence}')

    if aggregation_mode == 'closest':
        nearest = jnp.argmin(sq_dist, axis=1)                   # [Nq, K]
        onehot = jax.nn.one_hot(nearest, p, axis=1, dtype=weights.dtype)
        weights = weights * onehot
    elif aggregation_mode != 'sum':
        raise ValueError(f'unknown aggregation mode: {aggregation_mode}')
    return weights.astype(out_dtype)


def influence_weights_from_rel(
    rel_quant: jax.Array,        # [Nq, K, 3] int16, scale = radius/32767
    neighbor_inds: jax.Array,    # [Nq, K] (shadow == n_supports)
    n_supports: int,
    radius: float,
    kernel_points: jax.Array,    # [P, 3]
    kp_extent: float,
    kp_influence: str = 'linear',
    aggregation_mode: str = 'sum',
    out_dtype=jnp.bfloat16,
    rot: Optional[jax.Array] = None,    # [Nq, 3, 3] per-row rotation
    noise_key: Optional[jax.Array] = None,
    noise: float = 0.0,
) -> jax.Array:
    """Influence weights [Nq, P, K] from host-shipped relative vectors —
    no coordinate gather on device (the host radius search already
    computed support - query for every slot). Shadow slots are masked
    explicitly, reproducing the reference's zero influence for the
    1e6 shadow point (`convolution_ops.py:189-224`).

    ``rot``/``noise_key``: on-device augmentation for the cached-pyramid
    training path (d3feat_tpu.data.cache). Rotating the rel vectors is
    exactly equivalent to rotating the input cloud before the radius
    search (rotation preserves distances, and the constant-ones network
    sees geometry only through rel); the noise term is the difference of
    the two per-point jitters of the reference's rotate-then-search order
    (`datasets/ThreeDMatch.py:266-273`), i.e. triangular on (-noise, noise).
    """
    p = kernel_points.shape[0]
    rel = rel_quant.astype(jnp.float32) * (radius / 32767.0)
    if rot is not None:
        # points @ R semantics (data/augment.py): rel' = rel @ R_row
        rel = jnp.einsum('nkd,nde->nke', rel, rot.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    if noise_key is not None and noise > 0.0:
        u = jax.random.uniform(noise_key, rel.shape + (2,),
                               dtype=jnp.float32)
        rel = rel + (u[..., 0] - u[..., 1]) * noise
    sq_rel = jnp.sum(rel * rel, axis=-1)                        # [Nq, K]
    cross = jnp.einsum('nkd,pd->npk', rel, kernel_points,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    sq_kp = jnp.sum(kernel_points * kernel_points, axis=-1)
    sq_dist = jnp.maximum(
        sq_rel[:, None, :] - 2.0 * cross + sq_kp[None, :, None], 0.0)

    if kp_influence == 'constant':
        weights = jnp.ones_like(sq_dist)
    elif kp_influence == 'linear':
        weights = jnp.maximum(
            1.0 - jnp.sqrt(sq_dist + 1e-10) / (2.0 * kp_extent), 0.0)
    elif kp_influence == 'gaussian':
        sigma = kp_extent * 0.3
        weights = jnp.exp(-sq_dist / (2.0 * sigma * sigma + 1e-9))
    else:
        raise ValueError(f'unknown KP_influence: {kp_influence}')

    if aggregation_mode == 'closest':
        nearest = jnp.argmin(sq_dist, axis=1)
        onehot = jax.nn.one_hot(nearest, p, axis=1, dtype=weights.dtype)
        weights = weights * onehot
    elif aggregation_mode != 'sum':
        raise ValueError(f'unknown aggregation mode: {aggregation_mode}')

    valid = (neighbor_inds < n_supports).astype(weights.dtype)
    return (weights * valid[:, None, :]).astype(out_dtype)


def lane_pad_table(features: jax.Array, dtype=jnp.bfloat16,
                   with_rowsum: bool = False) -> jax.Array:
    """[Ns, C] -> [Ns+1, ceil((C+1)/128)*128] gather table: zero shadow row
    at index Ns, zero lane padding, and (when ``with_rowsum`` and a spare
    lane exists) the per-row channel sum stored in lane C.

    The rowsum lane was meant to make the density-normalization count
    (`convolution_ops.py:249-253`) ride the feature gather instead of
    re-reading the gathered [N, K, L] block — but measured SLOWER on v5e
    (69.8 vs 57.4 ms full-model: the strided column write + lost fusion
    cost more than the saved re-read), so it is off by default. Consumers
    of the full lane range are unaffected either way: the corresponding
    kernel-weight lanes are zero-padded.
    """
    n, c = features.shape
    lanes = -(-c // LANE) * LANE
    if lanes == c:
        with_rowsum = False  # no spare lane without growing the row
    table = jnp.zeros((n + 1, lanes), dtype=dtype)
    table = table.at[:n, :c].set(features.astype(dtype))
    if with_rowsum and c < lanes:
        rowsum = jnp.sum(features.astype(jnp.float32), axis=1)
        table = table.at[:n, c].set(rowsum.astype(dtype))
    return table


def kpconv_apply(
    neighbor_inds: jax.Array,    # [Nq, K], shadow == Ns
    weights: jax.Array,          # [Nq, P, K] from influence_weights
    table: jax.Array,            # [Ns+1, L] from lane_pad_table
    kernel_weights: jax.Array,   # [P, C_in, C_out]
    rowsum_lane: int = -1,       # lane holding the per-row channel sum
                                 # (from lane_pad_table), or -1 if absent
    inv: Optional[jax.Array] = None,  # inverse lists for the gather's
                                 # backward (ops/gather.py); training only
) -> jax.Array:
    """Feature half of KPConv over precomputed geometry (steps 5-6 of
    `kpconv`; density normalization of `convolution_ops.py:249-253`).

    Both einsums run at the full padded lane width L: slicing the gathered
    block to C_in first would force a materialized copy and break the fused
    gather+einsum fast path; the lane padding is zeros, and the kernel
    weights are zero-padded to match, so the extra lanes contribute nothing.
    """
    from d3feat_tpu.ops.gather import maybe_gather_rows
    l = table.shape[1]
    p, c_in, c_out = kernel_weights.shape
    nf = maybe_gather_rows(table, neighbor_inds, inv)          # [Nq, K, L]
    # Emit wf in the compute dtype: the MXU accumulates the K-contraction
    # in f32 either way, so a bf16 wf holds exactly astype(f32_wf, bf16)
    # — bit-identical to the old f32-materialize-then-cast, at half the
    # [Nq, P, L] HBM traffic (~822 MB -> 411 MB at 100k points, L0).
    wf = jnp.einsum('npk,nkl->npl', weights, nf,
                    preferred_element_type=weights.dtype,
                    precision=f32_exact_precision(weights, nf))
    kw = jnp.zeros((p, l, c_out), dtype=weights.dtype)
    kw = kw.at[:, :c_in, :].set(kernel_weights.astype(weights.dtype))
    out = jnp.einsum('npl,plo->no', wf.astype(weights.dtype), kw,
                     preferred_element_type=jnp.float32,
                     precision=f32_exact_precision(wf, kw))
    # density normalization: count neighbors with positive channel sum.
    # lane_pad_table can store the row channel-sum in a spare lane (free
    # with this gather); otherwise reduce the gathered lanes.
    if rowsum_lane >= 0:
        feat_sum = nf[:, :, rowsum_lane].astype(jnp.float32)
    else:
        feat_sum = jnp.sum(nf.astype(jnp.float32), axis=-1)
    neighbor_num = jnp.sum((feat_sum > 0.0).astype(out.dtype), axis=-1)
    neighbor_num = jnp.maximum(neighbor_num, 1.0)
    return out / neighbor_num[:, None]


def kpconv_ones(
    neighbor_inds: jax.Array,    # [Nq, K]
    weights: jax.Array,          # [Nq, P, K]
    kernel_weights: jax.Array,   # [P, 1, C_out]
    n_supports: int,
) -> jax.Array:
    """KPConv specialization for constant-ones input features (the network
    input, `datasets/ThreeDMatch.py:316`): the neighbor-feature gather
    reduces to the validity mask, eliminating the [N, K, C] gather."""
    valid = (neighbor_inds < n_supports).astype(weights.dtype)  # [Nq, K]
    wsum = jnp.einsum('npk,nk->np', weights, valid,
                      preferred_element_type=jnp.float32,       # [Nq, P]
                      precision=f32_exact_precision(weights, valid))
    # second contraction in the compute dtype (weights.dtype): explicit
    # bf16 operands == the MXU's old implicit DEFAULT rounding of the f32
    # inputs; f32 operands get exact-f32 (HIGHEST)
    wsum = wsum.astype(weights.dtype)
    kw = kernel_weights[:, 0, :].astype(weights.dtype)
    out = jnp.dot(wsum, kw, preferred_element_type=jnp.float32,
                  precision=f32_exact_precision(wsum, kw))
    neighbor_num = jnp.maximum(
        jnp.sum(valid.astype(jnp.float32), axis=-1), 1.0)
    return out / neighbor_num[:, None]


def index_max_pool(features: jax.Array, inds: jax.Array,
                   gather_dtype=None) -> jax.Array:
    """Max-pool rows of ``features`` over index lists.

    Reference `ind_max_pool` (`models/network_blocks.py:51-66`): the shadow
    row carries the column-wise minimum so padded slots never win the max.
    ``gather_dtype=bfloat16`` halves the gathered row bytes (max of rounded
    values; fine under the bf16 compute mode).
    """
    shadow = jnp.min(features, axis=0, keepdims=True)
    feats_ext = jnp.concatenate([features, shadow], axis=0)
    if gather_dtype is not None and gather_dtype != features.dtype:
        feats_ext = feats_ext.astype(gather_dtype)
    return jnp.max(feats_ext[inds], axis=1).astype(features.dtype)


def closest_pool(features: jax.Array, inds: jax.Array,
                 gather_dtype=None) -> jax.Array:
    """Copy the feature of the nearest (first-column) support point.

    Reference `closest_pool` (`models/network_blocks.py:69-83`): shadow row
    is zeros; only column 0 (nearest, lists are distance-sorted) is used.
    """
    feats_ext = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]), dtype=features.dtype)],
        axis=0)
    if gather_dtype is not None and gather_dtype != features.dtype:
        feats_ext = feats_ext.astype(gather_dtype)
    return feats_ext[inds[:, 0]].astype(features.dtype)


# ---------------------------------------------------------------------------
# Deformable KPConv (reference `KPConv_deform_ops`,
# `kernels/convolution_ops.py:379-507`).
#
# TPU-first re-design: the reference compacts in-range neighbors with a
# `top_k` re-gather whose width (`new_max_neighb`) is data-dependent — a
# dynamic shape XLA cannot compile. The compaction is purely a compute
# saver: every neighbor it drops contributes exactly zero to the output
# (linear/constant influence is zero beyond the extent; for gaussian the
# reference re-points dropped neighbors at the zero shadow feature row).
# The static-shape equivalent below therefore keeps the full [N, K] slots
# and zeroes the influence weights of (a) neighbors out of range of every
# deformed kernel point and (b) shadow slots — value-identical output for
# all three influence modes (golden-tested against a numpy re-execution of
# the reference graph INCLUDING its top_k compaction).
# ---------------------------------------------------------------------------


def deform_sq_distances(
    query_points: jax.Array,     # [Nq, 3]
    support_points: jax.Array,   # [Ns, 3]
    neighbor_inds: jax.Array,    # [Nq, K], shadow == Ns
    kernel_points: jax.Array,    # [P, 3]
    offsets: jax.Array,          # [Nq, P, 3]
) -> jax.Array:
    """Squared distances [Nq, K, P] from each neighbor to each *deformed*
    kernel point (`convolution_ops.py:414-436`). The shadow support row
    sits at 1000 (NOT 1e6 — deform_ops uses `ones_like * 1000`,
    `convolution_ops.py:415`), far outside any extent."""
    supports_ext = jnp.concatenate(
        [support_points, jnp.full((1, support_points.shape[1]), 1000.0,
                                  dtype=support_points.dtype)], axis=0)
    neigh_xyz = supports_ext[neighbor_inds]                    # [Nq, K, 3]
    rel = neigh_xyz - query_points[:, None, :]                 # [Nq, K, 3]
    deformed = kernel_points[None, :, :] + offsets             # [Nq, P, 3]
    # expanded form: |rel|^2 - 2 rel.dkp + |dkp|^2 (avoids [Nq,K,P,3]);
    # f32-exact contraction for the same reason as the rigid path.
    sq_rel = jnp.sum(rel * rel, axis=-1)                       # [Nq, K]
    cross = jnp.einsum('nkd,npd->nkp', rel, deformed,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    sq_dkp = jnp.sum(deformed * deformed, axis=-1)             # [Nq, P]
    return jnp.maximum(
        sq_rel[:, :, None] - 2.0 * cross + sq_dkp[:, None, :], 0.0)


def deform_influence_weights(
    sq_dist: jax.Array,          # [Nq, K, P]
    kp_extent: float,
    kp_influence: str = 'linear',
    aggregation_mode: str = 'sum',
) -> jax.Array:
    """Influence weights [Nq, P, K] with the reference's in-range drop.

    Notes vs the rigid path: the deformable linear influence divides by
    ``kp_extent`` — not 2*kp_extent (`convolution_ops.py:463-466` vs
    `:216-219`) — and neighbors out of range of EVERY deformed kernel
    point are dropped entirely (`:437-455`), which only matters for the
    gaussian influence (linear/constant are already zero out there)."""
    p = sq_dist.shape[-1]
    if kp_influence == 'constant':
        weights = (sq_dist < kp_extent ** 2).astype(jnp.float32)
    elif kp_influence == 'linear':
        weights = jnp.maximum(
            1.0 - jnp.sqrt(sq_dist + 1e-10) / kp_extent, 0.0)
    elif kp_influence == 'gaussian':
        sigma = kp_extent * 0.3
        weights = jnp.exp(-sq_dist / (2.0 * sigma * sigma + 1e-9))
    else:
        raise ValueError(f'unknown KP_influence: {kp_influence}')

    if aggregation_mode == 'closest':
        nearest = jnp.argmin(sq_dist, axis=2)                  # [Nq, K]
        weights = weights * jax.nn.one_hot(nearest, p,
                                           dtype=weights.dtype)
    elif aggregation_mode != 'sum':
        raise ValueError(f'unknown aggregation mode: {aggregation_mode}')

    in_range = jnp.any(sq_dist < kp_extent ** 2, axis=-1)      # [Nq, K]
    weights = weights * in_range[:, :, None].astype(weights.dtype)
    return jnp.transpose(weights, (0, 2, 1))                   # [Nq, P, K]


def kpconv_deform(
    query_points: jax.Array,     # [Nq, 3]
    support_points: jax.Array,   # [Ns, 3]
    neighbor_inds: jax.Array,    # [Nq, K], shadow == Ns
    features: jax.Array,         # [Ns, C_in]
    kernel_points: jax.Array,    # [P, 3]
    offsets: jax.Array,          # [Nq, P, 3]
    modulations: Optional[jax.Array],  # [Nq, P] or None
    kernel_weights: jax.Array,   # [P, C_in, C_out]
    kp_extent: float,
    kp_influence: str = 'linear',
    aggregation_mode: str = 'sum',
) -> jax.Array:
    """Deformable KPConv (`convolution_ops.py:379-507`), static shapes.

    Returns [Nq, C_out] float32. NOTE: unlike the rigid `kpconv`, the
    reference applies NO density normalization here (`:495-507`).
    """
    sq_dist = deform_sq_distances(query_points, support_points,
                                  neighbor_inds, kernel_points, offsets)
    weights = deform_influence_weights(sq_dist, kp_extent, kp_influence,
                                       aggregation_mode)       # [Nq, P, K]
    if modulations is not None:
        weights = weights * modulations[:, :, None]

    feats_ext = jnp.concatenate(
        [features, jnp.zeros((1, features.shape[1]),
                             dtype=features.dtype)], axis=0)
    neigh_feats = feats_ext[neighbor_inds]                     # [Nq, K, C]
    weighted = jnp.einsum('npk,nkc->npc', weights, neigh_feats,
                          preferred_element_type=jnp.float32,
                          precision=f32_exact_precision(weights,
                                                        neigh_feats))
    return jnp.einsum('npc,pco->no', weighted, kernel_weights,
                      preferred_element_type=jnp.float32,
                      precision=f32_exact_precision(weighted,
                                                    kernel_weights))
