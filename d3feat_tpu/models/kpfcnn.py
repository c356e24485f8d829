"""KPFCNN encoder/decoder + D3Feat soft detection head (flax linen).

Re-design of `models/D3Feat.py` + `models/network_blocks.py:1052-1118` +
the input unpacking of `models/KPFCNN_model.py:86-121`, generalized from
the reference's hard-wired 2-cloud (anchor+positive) stacking to B clouds
via `cloud_inds` segment ops, and made shape-static (pad rows masked).

TPU-first structure (see `d3feat_tpu.models.blocks` for rationale):
per-level kernel dispositions + shared influence weights, lane-padded
bf16 gather tables, ones-input shortcut for the first conv.

Forward contract (reference `assemble_FCNN_blocks`, `models/D3Feat.py:5-115`):
  returns (descriptors [N0, 32] L2-normalized, scores [N0, 1]).

Detection-head semantics reproduced exactly (`models/D3Feat.py:67-115`):
  * per-cloud **scalar** max normalization of the decoder features — the
    reference's `tf.reduce_max` with no axis reduces over points AND
    channels (`:84-90`);
  * alpha = softplus(f - mean over radius-neighbors), neighbor mean uses
    `count_nonzero` of channel-sums (`:92-98`);
  * beta = f / (1e-6 + channel max) (`:100-102`);
  * score = channel-max of alpha*beta (`:104-106`).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from d3feat_tpu.config import Config
from d3feat_tpu.models.blocks import (BlockCtx, LastUnary, ResnetBlock,
                                      ResnetBottleneck, SimpleBlock, Unary,
                                      max_pool, nearest_upsample)
from d3feat_tpu.ops.kernel_points import load_kernel_points


def init_kpfcnn(config: Config, pyramid: Dict, seed: int = 0):
    """Build a KPFCNN and initialize its variables under jit.

    Un-jitted flax init dispatches every op eagerly (~300 s on TPU for the
    flagship model); jitting it compiles once (~13 s).
    """
    model = KPFCNN(config)
    variables = jax.jit(model.init, static_argnames='training')(
        jax.random.PRNGKey(seed), pyramid, training=False)
    return model, variables


def init_variables(config: Config, seed: int = 0):
    """Initialize model variables from a small dummy pyramid.

    Parameters and kernel points depend only on channel dims and the
    config geometry — never on the pyramid capacities (verified by the
    padding-invariance test) — so a tiny synthetic cloud suffices and any
    bucket size can be served afterwards.
    """
    import numpy as np
    from d3feat_tpu.data.batching import make_test_batch
    rng = np.random.default_rng(0)
    scale = config.first_subsampling_dl * 40.0
    cloud = (rng.random((512, 3)) * scale).astype(np.float32)
    small = config.replace(max_points=1024, size_multiple=64,
                           level_capacity_ratio=1.0,
                           level_capacity_ratios=())
    batch = make_test_batch(cloud, small)
    _, variables = init_kpfcnn(config, batch['pyramid'], seed)
    return variables


class KPFCNN(nn.Module):
    """Fully-convolutional kernel-point network with detection head."""
    config: Config

    @nn.compact
    def __call__(self, pyramid: Dict, training: bool = False
                 ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        arch = cfg.architecture

        # One seeded kernel disposition per level, checkpointed. K_radius =
        # 1.5 * extent_l (convolution_ops.py:128) with extent_l =
        # KP_extent * dl0 * 2^l.
        kp_vars = []
        for l in range(cfg.num_layers):
            k_radius = 1.5 * cfg.KP_extent * cfg.first_subsampling_dl * 2 ** l

            def init_fn(l=l, k_radius=k_radius):
                return jnp.asarray(load_kernel_points(
                    k_radius, cfg.num_kernel_points,
                    fixed=cfg.fixed_kernel_points,
                    seed=cfg.kernel_seed + l))

            kp_vars.append(
                self.variable('kpoints', f'level{l}', init_fn))
        ctx = BlockCtx(pyramid, cfg, lambda l: kp_vars[l].value)

        # ---------------- encoder (network_blocks.py:1052-1118) -----------
        layer = 0
        fdim = cfg.first_features_dim
        features = pyramid['features']
        skips = []
        block_i = 0

        for block_i, block in enumerate(arch):
            if any(t in block for t in ('pool', 'strided', 'upsample',
                                        'global')):
                skips.append(features)
            if 'upsample' in block:
                break
            name = f'layer{layer}_{block}_{block_i}'
            # the network input is constant ones (ThreeDMatch.py:316);
            # the first conv then needs no feature gather
            ones_in = (block_i == 0 and cfg.in_features_dim == 1
                       and cfg.ones_input_features)
            features = self._encoder_block(
                block, ctx, features, layer, fdim, training, name, ones_in)
            if 'pool' in block or 'strided' in block:
                layer += 1
                fdim *= 2
        else:
            raise ValueError('architecture has no upsample block')

        # ---------------- decoder (models/D3Feat.py:26-63) ----------------
        start_i = block_i
        layer = cfg.num_layers - 1
        fdim = cfg.first_features_dim * 2 ** layer
        from d3feat_tpu.models.blocks import (ResnetbUpsampleBlock,
                                              SimpleUpsampleBlock)
        for j, block in enumerate(arch[start_i:]):
            name = f'uplayer{layer}_{block}_{j}'
            if block == 'nearest_upsample':
                features = nearest_upsample(ctx, features, layer)
            elif block == 'simple_upsample':
                features = SimpleUpsampleBlock(cfg, fdim, layer, name=name)(
                    ctx, features, training)
            elif block == 'resnetb_upsample':
                features = ResnetbUpsampleBlock(cfg, fdim, layer,
                                                name=name)(
                    ctx, features, training)
            elif block == 'unary':
                features = Unary(cfg, fdim, name=name)(
                    features, ctx.mask(layer), training)
            elif block == 'last_unary':
                features = LastUnary(cfg, name=name)(
                    features, ctx.mask(layer), training)
            else:
                raise ValueError(f'unsupported decoder block: {block}')
            if 'upsample' in block:
                layer -= 1
                fdim //= 2
                features = jnp.concatenate([features, skips[layer]], axis=1)

        # descriptors: L2-normalize, eps 1e-10 (models/D3Feat.py:65)
        sq = jnp.sum(jnp.square(features), axis=1, keepdims=True)
        descriptors = features * jax.lax.rsqrt(jnp.maximum(sq, 1e-10))

        gather_dtype = (jnp.bfloat16 if (cfg.compute_dtype == 'bfloat16'
                                         and cfg.score_dtype != 'float32')
                        else jnp.float32)
        inv0 = pyramid.get('inv_neighbors', (None,))[0]
        head_features = (features.astype(jnp.float32)
                         if cfg.score_dtype == 'float32' else features)
        scores = detection_scores(
            pyramid['neighbors'][0], pyramid['cloud_inds'],
            pyramid['masks'][0], head_features,
            num_clouds=pyramid['lengths'][0].shape[0],
            gather_dtype=gather_dtype, inv=inv0,
            lengths=pyramid['lengths'][0],
            norm_floor=cfg.score_norm_floor,
            beta_floor=cfg.score_beta_floor,
            score_clamp=cfg.score_clamp)
        return descriptors, scores

    def _encoder_block(self, block, ctx, features, layer, fdim,
                       training, name, ones_input=False):
        cfg = self.config
        if block == 'simple':
            return SimpleBlock(cfg, fdim, layer, ones_input=ones_input,
                               name=name)(ctx, features, training)
        if block == 'simple_strided':
            return SimpleBlock(cfg, fdim, layer, strided=True,
                               ones_input=ones_input, name=name)(
                ctx, features, training)
        if block == 'resnet':
            return ResnetBlock(cfg, fdim, layer, name=name)(
                ctx, features, training)
        if block == 'resnetb' or block == 'resnetb_light':
            return ResnetBottleneck(cfg, fdim, layer, name=name)(
                ctx, features, training)
        if block == 'resnetb_strided' or block == 'resnetb_light_strided':
            return ResnetBottleneck(cfg, fdim, layer, strided=True,
                                    name=name)(ctx, features, training)
        if block == 'resnetb_deformable':
            return ResnetBottleneck(cfg, fdim, layer, deformable=True,
                                    name=name)(ctx, features, training)
        if block == 'resnetb_deformable_strided':
            return ResnetBottleneck(cfg, fdim, layer, strided=True,
                                    deformable=True, name=name)(
                ctx, features, training)
        if block == 'unary':
            return Unary(cfg, fdim, name=name)(
                features, ctx.mask(layer), training)
        if block == 'vgg':
            from d3feat_tpu.models.blocks import VggBlock
            return VggBlock(cfg, fdim, layer, name=name)(
                ctx, features, training)
        if block == 'max_pool' or block == 'max_pool_wide':
            return max_pool(ctx, features, layer)
        if block == 'global_average':
            from d3feat_tpu.models.blocks import global_average
            return global_average(ctx, features, layer)
        if 'inception' in block:
            raise NotImplementedError(
                f'{block}: the reference registry calls these entries with '
                '`()` and would crash (`models/network_blocks.py:1009,'
                '1021`) — dead code with no working semantics to match')
        raise ValueError(f'unknown block name: {block}')


def detection_scores(neighbors0: jax.Array, cloud_inds: jax.Array,
                     mask0: jax.Array, features: jax.Array,
                     num_clouds: int, gather_dtype=jnp.float32,
                     inv=None, lengths=None,
                     norm_floor: float = 0.0,
                     beta_floor: float = 0.0,
                     score_clamp: float = 0.0) -> jax.Array:
    """D3Feat soft detection score (`models/D3Feat.py:67-115`).

    Args:
      neighbors0: [N0, K] level-0 neighbor lists (shadow == N0).
      cloud_inds: [N0] cloud id per row (pad rows -> num_clouds).
      mask0: [N0] valid-row mask.
      features: [N0, D] *unnormalized* decoder output.
      num_clouds: static B.
      lengths: optional [B] per-cloud valid counts — enables the exact
        reference clamp semantics (see below).
      norm_floor: floor on the per-cloud scalar max (config
        `score_norm_floor`). The reference normalizer `f/(cloud_max+1e-6)`
        explodes (value and ~1/cloud_max^2 gradient) when a cloud's
        feature max is tiny; flooring it bounds the det-loss gradient
        tail while leaving healthy batches untouched. 0 = reference.
      beta_floor: floor on the per-row channel max in the beta ratio
        (config `score_beta_floor`) — the second pole of the reference
        head: `f/(1e-6+depth_max)` with depth_max near/below zero
        (see the beta comment below). 0 = reference.
      score_clamp: upper clamp on the score (config `score_clamp`) —
        bounds the det-loss VALUE landscape the floors alone leave open
        (all-negative rows score ~ alpha*|f|/|denom|, unbounded as
        features drift negative). 0 = reference.

    Returns [N0, 1] scores (pad rows 0).
    """
    n0, d = features.shape
    neg_inf = jnp.asarray(-jnp.inf, features.dtype)

    # per-cloud scalar max over valid rows, all channels (D3Feat.py:84-90).
    # The reference gathers via in_batches rows padded with a zero shadow
    # row (datasets/common.py:465-495), so its max implicitly includes 0
    # for every cloud EXCEPT the batch's largest (whose in_batches row has
    # no pad slots). With `lengths` we reproduce that exactly: clamp at 0
    # only the clouds shorter than the batch max. Without lengths, clamp
    # uniformly — it differs only when every feature of every channel of
    # the largest cloud is negative.
    row_max = jnp.max(jnp.where(mask0[:, None], features, neg_inf), axis=1)
    cloud_max = jax.ops.segment_max(row_max, cloud_inds,
                                    num_segments=num_clouds + 1)
    if lengths is not None:
        is_largest = lengths == jnp.max(lengths)
        raw = cloud_max[:num_clouds]
        clamped = jnp.where(is_largest, raw, jnp.maximum(raw, 0.0))
        cloud_max = cloud_max.at[:num_clouds].set(clamped)
    else:
        cloud_max = jnp.maximum(cloud_max, 0.0)
    if norm_floor > 0.0:
        cloud_max = jnp.maximum(cloud_max, norm_floor)
    per_row_max = cloud_max[jnp.minimum(cloud_inds, num_clouds)]
    f = features / (per_row_max[:, None] + 1e-6)
    f = jnp.where(mask0[:, None], f, 0.0)

    # local saliency alpha (D3Feat.py:92-98); shadow row is zeros.
    # Gather from a 128-lane zero-padded table (fast-path layout); the
    # padded lanes are zero so channel sums over L equal sums over D.
    #
    # The neighbor mean is a pure gather+sum — XLA fuses the row gather
    # into the K-axis reduction without materializing the [N0, K, L] block
    # (measured 8.2 ms vs 14.3 ms for the einsum form at 3.6M rows,
    # scripts/microbench_gather.py). To keep that fusion, the denominator
    # comes from the shadow mask instead of the gathered channel sums: the
    # reference's `count_nonzero(reduce_sum(neighbor_features, -1))`
    # (D3Feat.py:96-98) counts exactly the non-shadow neighbors unless a
    # real point's normalized feature row sums to exactly 0.0 — a
    # measure-zero event the mask count intentionally ignores.
    from d3feat_tpu.ops.gather import maybe_gather_rows
    from d3feat_tpu.ops.kpconv import lane_pad_table
    table = lane_pad_table(f, gather_dtype)
    neigh_f = maybe_gather_rows(table, neighbors0, inv)  # [N0, K, L]
    if neigh_f.dtype == jnp.bfloat16:
        # accumulate the K-sum in bf16: measured 11.6 vs 14.3 ms at 3.6M
        # rows (microbench_head round3) — the K<=40-term mean tolerates
        # bf16 rounding on the already-bf16 fast path
        neigh_sum = jnp.sum(neigh_f, axis=1).astype(jnp.float32)
    else:
        neigh_sum = jnp.sum(neigh_f.astype(jnp.float32), axis=1)
    neigh_num = jnp.sum((neighbors0 < n0).astype(jnp.float32), axis=-1,
                        keepdims=True)
    neigh_num = jnp.maximum(neigh_num, 1.0)
    mean_f = neigh_sum[:, :d] / neigh_num
    alpha = jax.nn.softplus(f - mean_f)

    # channel-max ratio beta (D3Feat.py:100-102). The denominator is a
    # per-row channel max that can approach zero from EITHER side on weak
    # rows; `beta_floor` > 0 bounds its MAGNITUDE away from the pole,
    # preserving its sign (config `score_beta_floor`, 0 = reference).
    # Sign preservation is load-bearing: reference scores are always
    # >= 0 (all-negative rows have a negative denominator, so beta stays
    # positive), and the det loss relies on that lower bound — a one-
    # sided max() floor flipped beta negative on all-negative rows and
    # opened an unbounded det-loss hole (score -> -inf rewarded), which
    # collapsed training within 200 steps (r4a incident, RESULTS.md).
    depth_max = jnp.max(f, axis=1, keepdims=True)
    denom = 1e-6 + depth_max
    if beta_floor > 0.0:
        # the floored sign keys on depth_max (not on the 1e-6-shifted
        # denominator): depth_max <= 0 means every channel is <= 0, and
        # only a NEGATIVE denominator keeps beta — and the score — >= 0
        # there (depth_max in (-1e-6, 0] has a positive tiny denominator
        # in the reference, the second branch of the same pole)
        sgn = jnp.where(depth_max > 0.0, 1.0, -1.0)
        denom = jnp.where(jnp.abs(denom) < beta_floor, sgn * beta_floor,
                          denom)
    beta = f / denom

    score = jnp.max(alpha * beta, axis=1, keepdims=True)
    if score_clamp > 0.0:
        # bounded det-loss optimum: zero gradient past the clamp (config
        # `score_clamp` — see its comment for the runaway mode; 0 =
        # reference). Healthy trained scores are ~0.6-0.8, far below it.
        score = jnp.minimum(score, score_clamp)
    return jnp.where(mask0[:, None], score, 0.0)
