"""Network building blocks (flax linen).

Re-designed equivalents of the reference block library
(`models/network_blocks.py`), restructured for TPU:

  * **Shared per-level geometry.** Influence weights [N, K, P] are computed
    once per (level, index-matrix) and reused by every KPConv at that level
    (`d3feat_tpu.ops.kpconv.influence_weights`). This requires one kernel
    disposition per *level* instead of per conv — a documented deviation
    from the reference, which re-rotates the disposition per conv
    (`kernels/convolution_ops.py:137-148`); dispositions are still seeded
    and checkpointed.
  * **Lane-padded gather tables.** Neighbor-feature gathers read from a
    [Ns+1, 128-lane] zero-padded table (`lane_pad_table`) — measured ~2x
    faster than 32-lane rows on v5e, with the weight einsum fused over the
    padded gather.
  * **Ones-input shortcut.** The network input is constant ones
    (`datasets/ThreeDMatch.py:316`); the first conv then needs no feature
    gather at all (`kpconv_ones`).
  * masked batch norm (pad rows excluded from moments; the reference
    normalizes over all stacked real points, `network_blocks.py:149-165`);
  * weight init: truncated normal, std sqrt(2/fan_out), rounded to 3
    decimals (`network_blocks.py:37-41`, rounding quirk reproduced).

Block registry parity with `get_block_ops` (`network_blocks.py:982-1042`),
including the deformable bottleneck variants (`DeformableKPConvOp`; dead
code in all shipped reference configs, implemented for component parity).
The `inception_deformable*` entries crash in the reference itself
(called with `()` at `network_blocks.py:1009,1021`) and stay rejected.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.ops.kpconv import (closest_pool, deform_influence_weights,
                                   deform_sq_distances, f32_exact_precision,
                                   index_max_pool, influence_weights,
                                   influence_weights_from_rel, kpconv,
                                   kpconv_apply, kpconv_ones, lane_pad_table,
                                   unary_conv)


def trunc_normal_rounded(std: float):
    """weight_variable init (`network_blocks.py:37-41`): truncated normal
    std=sqrt(2/fan_out) with values rounded to 3 decimals."""
    base = jax.nn.initializers.truncated_normal(stddev=std, lower=-2.0,
                                                upper=2.0)

    def init(key, shape, dtype=jnp.float32):
        w = base(key, shape, dtype)
        return jnp.round(w * 1000.0) / 1000.0

    return init


def _compute_dtype(config: Config):
    """The forward compute dtype; stated explicitly at every contraction
    so bf16 is in the program (== the MXU's implicit DEFAULT rounding of
    f32 operands) and f32 operands always mean exact-f32 contractions."""
    return (jnp.bfloat16 if config.compute_dtype == 'bfloat16'
            else jnp.float32)


def leaky_relu(x: jax.Array) -> jax.Array:
    """alpha=0.2 (`network_blocks.py:185-186`)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class MaskedBatchNorm(nn.Module):
    """Batch norm whose batch moments exclude pad rows.

    Matches `tf.layers.batch_normalization(momentum=0.98, epsilon=1e-6)`
    (`network_blocks.py:156-160`): scale+center, running stats updated as
    ema = m*ema + (1-m)*batch.
    """
    momentum: float = 0.98
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array,
                 training: bool) -> jax.Array:
        d = x.shape[-1]
        gamma = self.param('gamma', nn.initializers.ones, (d,))
        beta = self.param('beta', nn.initializers.zeros, (d,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros(d, jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones(d, jnp.float32))

        if training:
            m = mask.astype(x.dtype)[:, None]
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=0) / count
            var = jnp.sum(jnp.square(x - mean) * m, axis=0) / count
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * gamma + beta


class BlockCtx:
    """Per-forward context: the pyramid, config, and lazily-computed shared
    geometry (per-level influence weights)."""

    def __init__(self, pyramid: Dict[str, Any], config: Config,
                 kernel_points):
        self.pyramid = pyramid
        self.config = config
        self.kernel_points = kernel_points  # level -> [P, 3]
        self._conv_w: Dict[int, jax.Array] = {}
        self._pool_w: Dict[int, jax.Array] = {}
        self._row_rot_cache: Dict[int, jax.Array] = {}

    # raw pyramid accessors ---------------------------------------------------
    def points(self, l):
        return self.pyramid['points'][l]

    def neighbors(self, l):
        return self.pyramid['neighbors'][l]

    def pools(self, l):
        return self.pyramid['pools'][l]

    def upsamples(self, l):
        return self.pyramid['upsamples'][l]

    def mask(self, l):
        return self.pyramid['masks'][l]

    def inv_neighbors(self, l):
        """Inverse adjacency for the conv gather's backward (training
        pyramids only)."""
        if 'inv_neighbors' in self.pyramid:
            return self.pyramid['inv_neighbors'][l]
        return None

    # shared geometry ---------------------------------------------------------
    def _dtype(self):
        return (jnp.bfloat16 if self.config.compute_dtype == 'bfloat16'
                else jnp.float32)

    # on-device augmentation (cached-pyramid training, data/cache.py) ---------
    def _row_rot(self, l: int):
        """Per-row [N_l, 3, 3] rotation from the batch's per-cloud
        'aug_rot' [B+1, 3, 3] (row B = identity for pad rows), or None."""
        rots = self.pyramid.get('aug_rot')
        if rots is None:
            return None
        if l not in self._row_rot_cache:
            lengths = self.pyramid['lengths'][l]
            b = lengths.shape[0]
            cap = self.points(l).shape[0]
            bounds = jnp.cumsum(lengths)
            seg = jnp.searchsorted(bounds, jnp.arange(cap), side='right')
            self._row_rot_cache[l] = rots[jnp.minimum(seg, b)]
        return self._row_rot_cache[l]

    def _noise_key(self, tag: int):
        key = self.pyramid.get('aug_key')
        if key is None:
            return None, 0.0
        return jax.random.fold_in(key, tag), self.config.augment_noise

    def extent(self, l: int) -> float:
        """KP extent at level l: KP_extent * r_l / density_parameter with
        r_l = dl0 * density * 2^l (`network_blocks.py:92`) = dl0*KP_extent*2^l."""
        cfg = self.config
        return cfg.KP_extent * cfg.first_subsampling_dl * 2 ** l

    def search_radius(self, l: int) -> float:
        """Host neighbor-search radius at level l (the int16 rel scale):
        r_l = dl0 * KP_extent * 2.5 * 2^l (`datasets/common.py:1312`)."""
        cfg = self.config
        return cfg.first_subsampling_dl * cfg.KP_extent * 2.5 * 2 ** l

    def conv_weights(self, l: int) -> jax.Array:
        if l not in self._conv_w:
            cfg = self.config
            if 'rels' in self.pyramid:
                key, noise = self._noise_key(l)
                self._conv_w[l] = influence_weights_from_rel(
                    self.pyramid['rels'][l], self.neighbors(l),
                    self.points(l).shape[0], self.search_radius(l),
                    self.kernel_points(l), self.extent(l),
                    cfg.KP_influence, cfg.convolution_mode, self._dtype(),
                    rot=self._row_rot(l), noise_key=key, noise=noise)
            else:
                self._conv_w[l] = influence_weights(
                    self.points(l), self.points(l), self.neighbors(l),
                    self.kernel_points(l), self.extent(l),
                    cfg.KP_influence, cfg.convolution_mode, self._dtype())
        return self._conv_w[l]

    def up_weights(self, l_coarse: int) -> jax.Array:
        """Influence weights for upsample convolutions (simple_upsample /
        resnetb_upsample, `network_blocks.py:893-968`): queries = fine
        level l_coarse-1, supports = coarse level l_coarse, index matrix =
        upsamples[l_coarse-1] built at radius 2*r_fine = r_coarse."""
        cfg = self.config
        ups = self.upsamples(l_coarse - 1)
        if ups.shape[1] < 2:
            raise ValueError(
                'upsample convolutions need config.upsample_k > 1 (the '
                'default 1 only supports nearest_upsample)')
        radius = self.search_radius(l_coarse)
        if 'up_rels' in self.pyramid:
            key, noise = self._noise_key(100 + l_coarse)
            return influence_weights_from_rel(
                self.pyramid['up_rels'][l_coarse - 1], ups,
                self.points(l_coarse).shape[0], radius,
                self.kernel_points(l_coarse), self.extent(l_coarse),
                cfg.KP_influence, cfg.convolution_mode, self._dtype(),
                rot=self._row_rot(l_coarse - 1), noise_key=key,
                noise=noise)
        return influence_weights(
            self.points(l_coarse - 1), self.points(l_coarse), ups,
            self.kernel_points(l_coarse), self.extent(l_coarse),
            cfg.KP_influence, cfg.convolution_mode, self._dtype())

    def pool_weights(self, l: int) -> jax.Array:
        if l not in self._pool_w:
            cfg = self.config
            if 'pool_rels' in self.pyramid:
                key, noise = self._noise_key(200 + l)
                self._pool_w[l] = influence_weights_from_rel(
                    self.pyramid['pool_rels'][l], self.pools(l),
                    self.points(l).shape[0], self.search_radius(l),
                    self.kernel_points(l), self.extent(l),
                    cfg.KP_influence, cfg.convolution_mode, self._dtype(),
                    rot=self._row_rot(l + 1), noise_key=key, noise=noise)
            else:
                self._pool_w[l] = influence_weights(
                    self.points(l + 1), self.points(l), self.pools(l),
                    self.kernel_points(l), self.extent(l),
                    cfg.KP_influence, cfg.convolution_mode, self._dtype())
        return self._pool_w[l]


class KPConvOp(nn.Module):
    """One rigid KPConv over shared level geometry (fast path)."""
    config: Config
    in_dim: int
    out_dim: int
    layer: int
    strided: bool = False
    ones_input: bool = False

    @nn.compact
    def __call__(self, ctx: BlockCtx, features: Optional[jax.Array]):
        cfg = self.config
        l = self.layer
        w = self.param(
            'weights',
            trunc_normal_rounded(float(np.sqrt(2.0 / self.out_dim))),
            (cfg.num_kernel_points, self.in_dim, self.out_dim))
        inds = ctx.pools(l) if self.strided else ctx.neighbors(l)
        geom = ctx.pool_weights(l) if self.strided else ctx.conv_weights(l)
        if self.ones_input:
            n_s = ctx.points(l).shape[0]
            return kpconv_ones(inds, geom, w, n_s)
        table = lane_pad_table(features, ctx._dtype())
        inv = None if self.strided else ctx.inv_neighbors(l)
        return kpconv_apply(inds, geom, table, w, inv=inv)


class DeformableKPConvOp(nn.Module):
    """Deformable KPConv (reference `KPConv_deformable` v1 and
    `KPConv_deformable_v2`, `kernels/convolution_ops.py:258-376,509-627`).

    v1: a rigid KPConv with zero-initialized weights + bias predicts a
    3-vector offset per kernel point (+ optional sigmoid modulations);
    v2: a pointwise MLP predicts offsets for all kernel points except the
    center, which stays fixed (modulation of the center is zero — a
    reference quirk reproduced as-is, `convolution_ops.py:571-576`).

    Offsets are scaled by the layer's KP extent (`convolution_ops.py:361`).
    Kernel disposition: per-*level* seeded disposition via the shared ctx
    (same documented deviation as the rigid fast path; the reference draws
    a fresh random rotation per conv).

    The offset regularization contributions (permissive / fitting,
    `models/KPFCNN_model.py:239-318`) are computed in-block — where the
    layer radius and extent are known — masked over real rows, and sown
    into the 'intermediates' collection as ('offset_loss', scalar sum) +
    ('offset_count', rows); the trainer folds
    `offsets_decay * sum(offset_loss)/...` into the total loss.
    """
    config: Config
    in_dim: int
    out_dim: int
    layer: int
    strided: bool = False

    @nn.compact
    def __call__(self, ctx: BlockCtx, features: jax.Array) -> jax.Array:
        cfg = self.config
        l = self.layer
        p = cfg.num_kernel_points
        dim = 3
        extent = ctx.extent(l)
        kpoints = ctx.kernel_points(l)

        if self.strided:
            queries, supports = ctx.points(l + 1), ctx.points(l)
            inds = ctx.pools(l)
            out_mask = ctx.mask(l + 1)
        else:
            queries = supports = ctx.points(l)
            inds = ctx.neighbors(l)
            out_mask = ctx.mask(l)

        version = cfg.deform_version
        modulated = cfg.modulated
        if version == 1:
            offset_dim = (dim + 1) * p if modulated else dim * p
            w0 = self.param('offset_conv_weights', nn.initializers.zeros,
                            (p, self.in_dim, offset_dim))
            b0 = self.param('offset_conv_bias', nn.initializers.zeros,
                            (offset_dim,))
            # rigid KPConv (incl. D3Feat density norm — KPConv_ops is
            # reused verbatim for the offsets, `convolution_ops.py:335-343`)
            feats0 = kpconv(queries, supports, inds, features, kpoints, w0,
                            extent, cfg.KP_influence,
                            cfg.convolution_mode) + b0
            offsets = feats0[:, :dim * p].reshape(-1, p, dim)
            modulations = (2.0 * jax.nn.sigmoid(feats0[:, dim * p:])
                           if modulated else None)
        elif version == 2:
            if self.strided:
                # v2's MLP consumes support-level features, but the conv
                # reads per-QUERY offsets — shape-inconsistent when
                # Nq != Ns. The reference never instantiates a strided v2
                # (dead path); reject loudly.
                raise ValueError('deform_version=2 with a strided block is '
                                 'shape-inconsistent in the reference too; '
                                 'use deform_version=1')
            offset_dim = ((dim + 1) * (p - 1) if modulated
                          else dim * (p - 1))
            w0 = self.param('offset_mlp_weights', nn.initializers.zeros,
                            (self.in_dim, offset_dim))
            b0 = self.param('offset_mlp_bias', nn.initializers.zeros,
                            (offset_dim,))
            feats0 = unary_conv(features, w0,
                                dtype=_compute_dtype(cfg)) + b0
            off = feats0[:, :dim * (p - 1)].reshape(-1, p - 1, dim)
            # center kernel point fixed (`convolution_ops.py:568-585`)
            offsets = jnp.concatenate(
                [jnp.zeros_like(off[:, :1, :]), off], axis=1)
            if modulated:
                mod = 2.0 * jax.nn.sigmoid(feats0[:, dim * (p - 1):])
                modulations = jnp.concatenate(
                    [jnp.zeros_like(mod[:, :1]), mod], axis=1)
            else:
                modulations = None
        else:
            raise ValueError(f'deform_version must be 1 or 2, '
                             f'got {version}')
        offsets = offsets * extent                       # `:361`

        deformed_kp = kpoints[None, :, :] + offsets      # [Nq, P, 3]
        sq_dist = deform_sq_distances(queries, supports, inds, kpoints,
                                      offsets)           # [Nq, K, P]
        weights = deform_influence_weights(sq_dist, extent,
                                           cfg.KP_influence,
                                           cfg.convolution_mode)
        if modulations is not None:
            # reference applies modulations to [N, P, C] after the k-sum
            # (`convolution_ops.py:485-487`); a per-(n,p) scalar commutes
            # with the sum over k, so fold it into the weights.
            weights = weights * modulations[:, :, None]

        w = self.param(
            'weights',
            trunc_normal_rounded(float(np.sqrt(2.0 / self.out_dim))),
            (p, self.in_dim, self.out_dim))
        feats_ext = jnp.concatenate(
            [features, jnp.zeros((1, features.shape[1]),
                                 dtype=features.dtype)], axis=0)
        neigh_feats = feats_ext[inds]
        weighted = jnp.einsum('npk,nkc->npc', weights, neigh_feats,
                              preferred_element_type=jnp.float32,
                              precision=f32_exact_precision(
                                  weights, neigh_feats))
        out = jnp.einsum('npc,pco->no', weighted, w,
                         preferred_element_type=jnp.float32,
                         precision=f32_exact_precision(
                             weighted, w))
        # NO density normalization (`convolution_ops.py:495-507`).

        self._sow_offset_loss(ctx, deformed_kp, sq_dist, out_mask, extent)
        return out

    def _sow_offset_loss(self, ctx, deformed_kp, sq_dist, mask, extent):
        """Offset regularization (`models/KPFCNN_model.py:239-318`),
        masked to real rows (the reference has no pad rows)."""
        cfg = self.config
        mode = cfg.offsets_loss
        if mode == 'none':
            return
        m = mask.astype(jnp.float32)
        count = jnp.maximum(jnp.sum(m), 1.0)
        if mode == 'permissive':
            # zero inside the conv radius, linear outside (`:239-260`)
            conv_radius = (cfg.first_subsampling_dl * cfg.density_parameter
                           * 2 ** self.layer)
            kp_norm = jnp.sqrt(jnp.maximum(
                jnp.sum(jnp.square(deformed_kp), axis=2), 1e-20))
            outside = jnp.maximum(0.0, kp_norm / conv_radius - 1.0)
            loss = jnp.sum(jnp.mean(outside, axis=1) * m) / count
        elif mode == 'fitting':
            # squared distance of each deformed KP to its closest real
            # input point, normalized by extent^2 (`:263-287`). Shadow
            # slots sit at ~1000 so they never win the min, matching the
            # reference's shadow-inclusive reduce_min.
            kp_min_d2 = jnp.min(sq_dist, axis=1) / extent ** 2  # [Nq, P]
            loss = jnp.sum(jnp.mean(kp_min_d2, axis=1) * m) / count
            # repulsion between deformed kernel points (`:289-303`)
            kp_locs = deformed_kp / extent
            diff = (kp_locs[:, :, None, :]
                    - jax.lax.stop_gradient(kp_locs[:, None, :, :]))
            dist = jnp.sqrt(1e-10 + jnp.sum(jnp.square(diff), axis=3))
            p = kp_locs.shape[1]
            off_diag = 1.0 - jnp.eye(p, dtype=dist.dtype)
            rep = jnp.square(jnp.maximum(0.0, 1.5 - dist)) * off_diag
            rep = jnp.sum(rep, axis=(1, 2))
            loss = loss + jnp.sum(rep * m) / count
        else:
            raise ValueError(f'unknown offsets_loss: {mode}')
        self.sow('intermediates', 'offset_loss', loss,
                 reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)


class Unary(nn.Module):
    """1x1 conv + BN + leaky relu (`network_blocks.py:207-219`)."""
    config: Config
    out_dim: int
    bn_relu: bool = True

    @nn.compact
    def __call__(self, x, mask, training):
        w = self.param('weights',
                       trunc_normal_rounded(float(np.sqrt(2.0 / self.out_dim))),
                       (x.shape[-1], self.out_dim))
        y = unary_conv(x, w, dtype=_compute_dtype(self.config))
        if self.bn_relu:
            y = MaskedBatchNorm(self.config.batch_norm_momentum)(
                y, mask, training)
            y = leaky_relu(y)
        return y


class LastUnary(nn.Module):
    """Final 1x1 conv to the descriptor dim, no BN/ReLU
    (`network_blocks.py:194-205`)."""
    config: Config

    @nn.compact
    def __call__(self, x, mask, training):
        d = self.config.out_features_dim
        w = self.param('weights',
                       trunc_normal_rounded(float(np.sqrt(2.0 / d))),
                       (x.shape[-1], d))
        return unary_conv(x, w, dtype=_compute_dtype(self.config))


class SimpleBlock(nn.Module):
    """KPConv + BN + leaky relu (`network_blocks.py:222-245`); the strided
    variant convolves onto the next level via pool indices (`:247-269`)."""
    config: Config
    fdim: int
    layer: int
    strided: bool = False
    ones_input: bool = False

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        l = self.layer
        out_mask = ctx.mask(l + 1) if self.strided else ctx.mask(l)
        in_dim = 1 if self.ones_input else x.shape[-1]
        y = KPConvOp(self.config, in_dim, self.fdim, l,
                     strided=self.strided, ones_input=self.ones_input)(
            ctx, x)
        y = MaskedBatchNorm(self.config.batch_norm_momentum)(
            y, out_mask, training)
        return leaky_relu(y)


class ResnetBottleneck(nn.Module):
    """resnetb / resnetb_strided (`network_blocks.py:320-368,561-612`):
    unary(fdim/2) -> KPConv(fdim/2) -> unary(2*fdim) + shortcut. Strided:
    the KPConv pools onto the next level; shortcut is index max-pool.
    ``deformable`` swaps conv2 for a deformable KPConv
    (resnetb_deformable / resnetb_deformable_strided,
    `network_blocks.py:424-471,672-724`)."""
    config: Config
    fdim: int
    layer: int
    strided: bool = False
    deformable: bool = False

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        cfg, l, fdim = self.config, self.layer, self.fdim
        in_mask = ctx.mask(l)
        out_mask = ctx.mask(l + 1) if self.strided else in_mask

        y = Unary(cfg, fdim // 2, name='conv1')(x, in_mask, training)
        if self.deformable:
            y = DeformableKPConvOp(cfg, fdim // 2, fdim // 2, l,
                                   strided=self.strided, name='conv2')(
                ctx, y)
        else:
            y = KPConvOp(cfg, fdim // 2, fdim // 2, l,
                         strided=self.strided, name='conv2')(ctx, y)
        y = MaskedBatchNorm(cfg.batch_norm_momentum, name='conv2_bn')(
            y, out_mask, training)
        y = leaky_relu(y)

        y = Unary(cfg, 2 * fdim, bn_relu=False, name='conv3_w')(
            y, out_mask, training)
        y = MaskedBatchNorm(cfg.batch_norm_momentum, name='conv3_bn')(
            y, out_mask, training)

        if self.strided:
            shortcut = index_max_pool(x, ctx.pools(l),
                                      gather_dtype=ctx._dtype())
        else:
            shortcut = x
        if shortcut.shape[-1] != 2 * fdim:
            shortcut = Unary(cfg, 2 * fdim, bn_relu=False,
                             name='shortcut_w')(shortcut, out_mask, training)
            shortcut = MaskedBatchNorm(cfg.batch_norm_momentum,
                                       name='shortcut_bn')(
                shortcut, out_mask, training)
        return leaky_relu(y + shortcut)


class ResnetBlock(nn.Module):
    """resnet double conv block (`network_blocks.py:271-318`)."""
    config: Config
    fdim: int
    layer: int

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        cfg, l = self.config, self.layer
        mask = ctx.mask(l)
        y = x
        for i in range(2):
            y = KPConvOp(cfg, y.shape[-1], self.fdim, l,
                         name=f'conv{i + 1}')(ctx, y)
            y = MaskedBatchNorm(cfg.batch_norm_momentum,
                                name=f'bn{i + 1}')(y, mask, training)
            y = leaky_relu(y)
        shortcut = x
        if shortcut.shape[-1] != self.fdim:
            shortcut = Unary(cfg, self.fdim, bn_relu=False,
                             name='shortcut_w')(shortcut, mask, training)
            shortcut = MaskedBatchNorm(cfg.batch_norm_momentum,
                                       name='shortcut_bn')(
                shortcut, mask, training)
        return leaky_relu(y + shortcut)


class VggBlock(nn.Module):
    """Two simple convolutions (`network_blocks.py:817-852`)."""
    config: Config
    fdim: int
    layer: int

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        for i in range(2):
            x = SimpleBlock(self.config, self.fdim, self.layer,
                            name=f'conv{i + 1}')(ctx, x, training)
        return x


class UpsampleKPConv(nn.Module):
    """KPConv over the upsample index lists: queries at the finer level,
    supports at the coarse level (`network_blocks.py:893-915`)."""
    config: Config
    in_dim: int
    out_dim: int
    layer: int  # coarse level

    @nn.compact
    def __call__(self, ctx: BlockCtx, features):
        cfg = self.config
        w = self.param(
            'weights',
            trunc_normal_rounded(float(np.sqrt(2.0 / self.out_dim))),
            (cfg.num_kernel_points, self.in_dim, self.out_dim))
        table = lane_pad_table(features, ctx._dtype())
        return kpconv_apply(ctx.upsamples(self.layer - 1),
                            ctx.up_weights(self.layer), table, w)


class SimpleUpsampleBlock(nn.Module):
    """simple_upsample (`network_blocks.py:893-915`): upsample KPConv +
    BN + leaky relu."""
    config: Config
    fdim: int
    layer: int

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        y = UpsampleKPConv(self.config, x.shape[-1], self.fdim,
                           self.layer)(ctx, x)
        y = MaskedBatchNorm(self.config.batch_norm_momentum)(
            y, ctx.mask(self.layer - 1), training)
        return leaky_relu(y)


class ResnetbUpsampleBlock(nn.Module):
    """resnetb_upsample (`network_blocks.py:918-968`): bottleneck with an
    upsample KPConv; shortcut = nearest interpolation (closest_pool)."""
    config: Config
    fdim: int
    layer: int

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        cfg, l, fdim = self.config, self.layer, self.fdim
        out_mask = ctx.mask(l - 1)
        y = Unary(cfg, fdim // 2, name='conv1')(x, ctx.mask(l), training)
        y = UpsampleKPConv(cfg, fdim // 2, fdim // 2, l, name='conv2')(
            ctx, y)
        y = MaskedBatchNorm(cfg.batch_norm_momentum, name='conv2_bn')(
            y, out_mask, training)
        y = leaky_relu(y)
        y = Unary(cfg, 2 * fdim, bn_relu=False, name='conv3_w')(
            y, out_mask, training)
        y = MaskedBatchNorm(cfg.batch_norm_momentum, name='conv3_bn')(
            y, out_mask, training)

        shortcut = closest_pool(x, ctx.upsamples(l - 1))
        if shortcut.shape[-1] != 2 * fdim:
            shortcut = Unary(cfg, 2 * fdim, bn_relu=False,
                             name='shortcut_w')(shortcut, out_mask, training)
            shortcut = MaskedBatchNorm(cfg.batch_norm_momentum,
                                       name='shortcut_bn')(
                shortcut, out_mask, training)
        return leaky_relu(y + shortcut)


def nearest_upsample(ctx: BlockCtx, x, layer: int):
    """Copy each fine point the feature of its nearest coarse point
    (`network_blocks.py:971-979`): uses upsamples[layer-1], rows = fine
    points of level layer-1, indices into level `layer`."""
    return closest_pool(x, ctx.upsamples(layer - 1),
                        gather_dtype=ctx._dtype())


def max_pool(ctx: BlockCtx, x, layer: int):
    """max_pool block (`network_blocks.py` max_pool_block): pool features
    onto the next level with index max-pool."""
    return index_max_pool(x, ctx.pools(layer))


def global_average(ctx: BlockCtx, x, layer: int):
    """Per-cloud global average (`network_blocks.py:866-890`): returns a
    [B, C] summary. Rows are ordered per cloud, so segment ids come from
    the cumulative per-cloud lengths at this level."""
    lengths = ctx.pyramid['lengths'][layer]
    b = lengths.shape[0]
    cap = x.shape[0]
    bounds = jnp.cumsum(lengths)
    rows = jnp.arange(cap)
    seg = jnp.searchsorted(bounds, rows, side='right')  # pad rows -> b
    mask = ctx.mask(layer).astype(x.dtype)
    sums = jax.ops.segment_sum(x * mask[:, None], seg, num_segments=b + 1)
    counts = jax.ops.segment_sum(mask, seg, num_segments=b + 1)
    return sums[:b] / jnp.maximum(counts[:b], 1.0)[:, None]
