"""Tests for the less-common block registry entries and dispositions:
vgg, global_average, simple_upsample, resnetb_upsample, verticals."""

import jax
import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data import build_pyramid
from d3feat_tpu.models import KPFCNN
from d3feat_tpu.ops.kernel_points import load_kernel_points, optimize_kernel_points


def cfg_with(arch, **kw):
    base = dict(
        max_points=1024, size_multiple=64,
        level_capacity_ratio=1.0, level_capacity_ratios=(),
        first_features_dim=8, out_features_dim=8,
        neighborhood_limits=(10, 10, 10, 10, 10),
        compute_dtype='float32', architecture=tuple(arch))
    base.update(kw)
    return threedmatch_config(**base)


def pyr_for(cfg, rng, n=250):
    a = (rng.random((n, 3))).astype(np.float32)
    b = (rng.random((n - 30, 3))).astype(np.float32)
    return build_pyramid(np.concatenate([a, b]), [n, n - 30], cfg)


def run_forward(cfg, rng):
    pyr = pyr_for(cfg, rng)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), pyr, training=False)
    desc, score = model.apply(variables, pyr, training=False)
    assert np.isfinite(np.asarray(desc)).all()
    assert np.isfinite(np.asarray(score)).all()
    return desc, score


@pytest.mark.slow
def test_vgg_block(rng):
    cfg = cfg_with(['vgg', 'resnetb_strided', 'resnetb',
                    'nearest_upsample', 'unary', 'last_unary'])
    run_forward(cfg, rng)


def test_simple_upsample_block(rng):
    cfg = cfg_with(['simple', 'resnetb_strided', 'resnetb',
                    'simple_upsample', 'unary', 'last_unary'],
                   upsample_k=8)
    run_forward(cfg, rng)


def test_resnetb_upsample_block(rng):
    cfg = cfg_with(['simple', 'resnetb_strided', 'resnetb',
                    'resnetb_upsample', 'unary', 'last_unary'],
                   upsample_k=8)
    run_forward(cfg, rng)


def test_upsample_conv_requires_wide_k(rng):
    cfg = cfg_with(['simple', 'resnetb_strided', 'resnetb',
                    'simple_upsample', 'unary', 'last_unary'])  # k=1
    pyr = pyr_for(cfg, rng)
    with pytest.raises(ValueError, match='upsample_k'):
        KPFCNN(cfg).init(jax.random.PRNGKey(0), pyr, training=False)


def test_global_average(rng):
    from d3feat_tpu.models.blocks import BlockCtx, global_average
    cfg = cfg_with(['simple', 'resnetb_strided', 'resnetb',
                    'nearest_upsample', 'unary', 'last_unary'])
    pyr = pyr_for(cfg, rng)
    ctx = BlockCtx(pyr, cfg, lambda l: None)
    n0 = pyr['features'].shape[0]
    feats = np.arange(n0, dtype=np.float32)[:, None].repeat(4, 1)
    out = np.asarray(global_average(ctx, feats, 0))
    assert out.shape == (2, 4)
    lens = pyr['lengths'][0]
    want0 = np.mean(np.arange(lens[0]))
    want1 = np.mean(np.arange(lens[0], lens[0] + lens[1]))
    np.testing.assert_allclose(out[0], want0, rtol=1e-6)
    np.testing.assert_allclose(out[1], want1, rtol=1e-6)


def test_verticals_disposition():
    kp = optimize_kernel_points(7, fixed='verticals', num_tries=4,
                                max_iter=1500, seed=1)
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-9)
    # vertical points stay on the z axis
    np.testing.assert_allclose(kp[1, :2], 0.0, atol=1e-9)
    np.testing.assert_allclose(kp[2, :2], 0.0, atol=1e-9)
    assert kp[1, 2] > 0 > kp[2, 2]
    loaded = load_kernel_points(0.1, 7, fixed='verticals', seed=2,
                                jitter=False)
    # z-only rotation preserves verticality
    np.testing.assert_allclose(loaded[1, :2], 0.0, atol=1e-7)
