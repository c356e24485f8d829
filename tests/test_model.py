"""Model-level tests: KPFCNN forward, detection head, padding invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data import build_pyramid
from d3feat_tpu.models import KPFCNN
from d3feat_tpu.models.kpfcnn import detection_scores


def tiny_config(**kw):
    base = dict(
        max_points=2048,
        size_multiple=64,
        level_capacity_ratio=1.0, level_capacity_ratios=(),
        first_features_dim=8,
        out_features_dim=8,
        neighborhood_limits=(12, 12, 12, 12, 12),
        compute_dtype='float32',
    )
    base.update(kw)
    return threedmatch_config(**base)


def two_cloud_pyramid(rng, cfg, n_a=300, n_b=250, scale=1.0):
    a = (rng.random((n_a, 3)) * scale).astype(np.float32)
    b = (rng.random((n_b, 3)) * scale).astype(np.float32)
    pts = np.concatenate([a, b])
    return build_pyramid(pts, [n_a, n_b], cfg)


def test_pyramid_shapes(rng):
    cfg = tiny_config()
    pyr = two_cloud_pyramid(rng, cfg)
    caps = cfg.level_capacities()
    L = cfg.num_layers
    assert len(pyr['points']) == L == 5
    for l in range(L):
        assert pyr['points'][l].shape == (caps[l], 3)
        assert pyr['neighbors'][l].shape == (caps[l], cfg.neighborhood_limits[l])
        assert pyr['masks'][l].shape == (caps[l],)
        # shadow index == capacity; valid indices < valid count
        n_valid = int(pyr['lengths'][l].sum())
        neigh = pyr['neighbors'][l]
        assert np.all((neigh < n_valid) | (neigh == caps[l]))
        # valid rows of strictly decreasing count up the pyramid
        assert pyr['masks'][l].sum() == n_valid
    assert len(pyr['pools']) == L - 1
    assert len(pyr['upsamples']) == L - 1
    for l in range(L - 1):
        assert pyr['pools'][l].shape[0] == caps[l + 1]
        assert pyr['upsamples'][l].shape == (caps[l], 1)


def test_pyramid_batch_isolation(rng):
    """Neighbor/pool indices never cross cloud boundaries."""
    cfg = tiny_config()
    pyr = two_cloud_pyramid(rng, cfg)
    for l in range(cfg.num_layers):
        lens = pyr['lengths'][l]
        n_a = int(lens[0])
        n_tot = int(lens.sum())
        cap = pyr['points'][l].shape[0]
        neigh = pyr['neighbors'][l]
        rows_a = neigh[:n_a]
        assert np.all((rows_a < n_a) | (rows_a == cap))
        rows_b = neigh[n_a:n_tot]
        assert np.all(((rows_b >= n_a) & (rows_b < n_tot)) | (rows_b == cap))


@pytest.mark.slow
def test_forward_shapes_and_finite(rng):
    cfg = tiny_config()
    pyr = two_cloud_pyramid(rng, cfg)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), pyr, training=False)
    desc, scores = model.apply(variables, pyr, training=False)
    n0 = pyr['features'].shape[0]
    assert desc.shape == (n0, cfg.out_features_dim)
    assert scores.shape == (n0, 1)
    assert np.isfinite(np.asarray(desc)).all()
    assert np.isfinite(np.asarray(scores)).all()
    mask = pyr['masks'][0]
    # valid descriptors are unit-norm
    norms = np.linalg.norm(np.asarray(desc)[mask], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # pad scores are exactly zero; valid scores nonnegative
    s = np.asarray(scores)[:, 0]
    assert np.all(s[~mask] == 0.0)
    assert np.all(s[mask] >= 0.0)


def test_padding_invariance(rng):
    """The same clouds padded into a larger bucket must produce identical
    descriptors/scores on the valid rows — the core static-shape property."""
    cfg_small = tiny_config(max_points=1024)
    cfg_big = tiny_config(max_points=2048)
    a = (rng.random((200, 3))).astype(np.float32)
    b = (rng.random((180, 3))).astype(np.float32)
    pts = np.concatenate([a, b])
    pyr_s = build_pyramid(pts, [200, 180], cfg_small)
    pyr_b = build_pyramid(pts, [200, 180], cfg_big)

    model_s, model_b = KPFCNN(cfg_small), KPFCNN(cfg_big)
    vars_s = model_s.init(jax.random.PRNGKey(7), pyr_s, training=False)
    desc_s, score_s = model_s.apply(vars_s, pyr_s, training=False)
    # same params (they only depend on channel dims, not capacities)
    desc_b, score_b = model_b.apply(vars_s, pyr_b, training=False)

    n_valid = 380
    np.testing.assert_allclose(np.asarray(desc_s)[:n_valid],
                               np.asarray(desc_b)[:n_valid],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(score_s)[:n_valid],
                               np.asarray(score_b)[:n_valid],
                               rtol=1e-4, atol=1e-5)


def test_detection_scores_oracle(rng):
    """Numpy oracle re-executing models/D3Feat.py:76-115 for 2 clouds."""
    n_a, n_b, k, d = 30, 25, 6, 8
    n = n_a + n_b
    feats = rng.standard_normal((n, d)).astype(np.float32) + 1.0
    neigh = rng.integers(0, n, (n, k)).astype(np.int32)
    neigh[rng.random((n, k)) < 0.2] = n  # shadow

    # oracle (2-cloud reference math, scalar max includes the 0 shadow)
    m0 = max(feats[:n_a].max(), 0.0)
    m1 = max(feats[n_a:].max(), 0.0)
    per_max = np.concatenate([np.full(n_a, m0), np.full(n_b, m1)])
    f = feats / (per_max[:, None] + 1e-6)
    f_ext = np.concatenate([f, np.zeros((1, d), np.float32)])
    nf = f_ext[neigh]
    nsum = nf.sum(-1)
    nnum = np.maximum((nsum != 0).sum(-1, keepdims=True), 1)
    mean = nf.sum(1) / nnum
    alpha = np.log1p(np.exp(-np.abs(f - mean))) + np.maximum(f - mean, 0)
    beta = f / (1e-6 + f.max(1, keepdims=True))
    want = (alpha * beta).max(1, keepdims=True)

    cloud_inds = np.concatenate([np.zeros(n_a, np.int32),
                                 np.ones(n_b, np.int32)])
    mask = np.ones(n, bool)
    got = np.asarray(detection_scores(jnp.asarray(neigh),
                                      jnp.asarray(cloud_inds),
                                      jnp.asarray(mask),
                                      jnp.asarray(feats), num_clouds=2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_detection_scores_largest_cloud_unclamped(rng):
    """Exact reference clamp semantics (`datasets/common.py:465-495` +
    `models/D3Feat.py:84-90`): the per-cloud scalar max implicitly
    includes 0 via in_batches pad slots for every cloud EXCEPT the batch's
    largest. With all-negative features, the largest cloud must be
    normalized by its true (negative) max, the smaller one by ~0."""
    n_a, n_b, k, d = 30, 25, 6, 8
    n = n_a + n_b
    feats = rng.standard_normal((n, d)).astype(np.float32) - 10.0  # all < 0
    assert feats.max() < 0
    neigh = rng.integers(0, n, (n, k)).astype(np.int32)

    m0 = feats[:n_a].max()            # largest cloud: NO implicit 0
    m1 = max(feats[n_a:].max(), 0.0)  # smaller cloud: clamped
    per_max = np.concatenate([np.full(n_a, m0), np.full(n_b, m1)])
    f = f_ext = feats / (per_max[:, None] + 1e-6)
    f_ext = np.concatenate([f, np.zeros((1, d), np.float32)])
    nf = f_ext[neigh]
    nnum = np.maximum((neigh < n).sum(-1, keepdims=True), 1)
    mean = nf.sum(1) / nnum
    alpha = np.log1p(np.exp(-np.abs(f - mean))) + np.maximum(f - mean, 0)
    beta = f / (1e-6 + f.max(1, keepdims=True))
    want = (alpha * beta).max(1, keepdims=True)

    cloud_inds = np.concatenate([np.zeros(n_a, np.int32),
                                 np.ones(n_b, np.int32)])
    got = np.asarray(detection_scores(
        jnp.asarray(neigh), jnp.asarray(cloud_inds),
        jnp.asarray(np.ones(n, bool)), jnp.asarray(feats), num_clouds=2,
        lengths=jnp.asarray([n_a, n_b], np.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_score_norm_floor(rng):
    """`score_norm_floor` bounds the det-head gradient tail on tiny-max
    batches (the round-3 70%-clip root cause) without touching healthy
    batches (config-gated; 0 = exact reference semantics)."""
    n_a, n_b, k, d = 30, 25, 6, 8
    n = n_a + n_b
    neigh = rng.integers(0, n, (n, k)).astype(np.int32)
    cloud_inds = np.concatenate([np.zeros(n_a, np.int32),
                                 np.ones(n_b, np.int32)])
    mask = np.ones(n, bool)

    def grad_norm(feats, floor):
        def f(x):
            s = detection_scores(jnp.asarray(neigh),
                                 jnp.asarray(cloud_inds),
                                 jnp.asarray(mask), x, num_clouds=2,
                                 norm_floor=floor)
            return jnp.sum(s)
        g = jax.grad(f)(jnp.asarray(feats))
        return float(jnp.linalg.norm(g))

    # degenerate batch: per-cloud feature max ~1e-4 (the explosive regime)
    tiny = (rng.standard_normal((n, d)).astype(np.float32) * 1e-4)
    g_ref = grad_norm(tiny, 0.0)
    g_floor = grad_norm(tiny, 0.1)
    assert g_floor < g_ref / 50, (g_ref, g_floor)

    # healthy batch: max well above the floor -> floor is a no-op
    healthy = rng.standard_normal((n, d)).astype(np.float32) + 1.0
    s_ref = detection_scores(jnp.asarray(neigh), jnp.asarray(cloud_inds),
                             jnp.asarray(mask), jnp.asarray(healthy),
                             num_clouds=2, norm_floor=0.0)
    s_floor = detection_scores(jnp.asarray(neigh), jnp.asarray(cloud_inds),
                               jnp.asarray(mask), jnp.asarray(healthy),
                               num_clouds=2, norm_floor=0.1)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_floor))


def test_score_beta_floor(rng):
    """`score_beta_floor` bounds the det-head's SECOND gradient pole —
    the per-row channel max `depth_max` sitting near/below zero in
    `beta = f/(1e-6+depth_max)` (models/D3Feat.py:100-102). Rows whose
    channel max clears the floor are bit-identical (0 = reference)."""
    n, k, d = 40, 6, 8
    neigh = rng.integers(0, n, (n, k)).astype(np.int32)
    cloud_inds = np.zeros(n, np.int32)
    mask = np.ones(n, bool)

    def grad_norm(feats, floor):
        def f(x):
            s = detection_scores(jnp.asarray(neigh),
                                 jnp.asarray(cloud_inds),
                                 jnp.asarray(mask), x, num_clouds=1,
                                 beta_floor=floor)
            return jnp.sum(s)
        g = jax.grad(f)(jnp.asarray(feats))
        return float(jnp.linalg.norm(g))

    # adversarial rows: channel max just below zero -> the denominator
    # 1e-6 + depth_max crosses ~0 (the explosive pole)
    feats = rng.standard_normal((n, d)).astype(np.float32)
    feats[5] = -np.abs(feats[5]) * 1e-5 - 2e-6
    feats[17] = -np.abs(feats[17]) * 1e-5 - 2e-6
    g_ref = grad_norm(feats, 0.0)
    g_floor = grad_norm(feats, 0.01)
    assert g_floor < g_ref / 50, (g_ref, g_floor)

    # scores stay >= 0 under the floor (the reference invariant the det
    # loss relies on): all-negative rows keep a NEGATIVE denominator, so
    # beta must not flip sign (r4a collapse incident — a one-sided max()
    # floor rewarded score -> -inf and collapsed training in 200 steps)
    feats_neg = feats.copy()
    feats_neg[3] = -np.abs(feats_neg[3]) - 0.5       # strongly all-negative
    s = detection_scores(jnp.asarray(neigh), jnp.asarray(cloud_inds),
                         jnp.asarray(mask), jnp.asarray(feats_neg),
                         num_clouds=1, beta_floor=0.01)
    assert float(jnp.min(s)) >= 0.0, float(jnp.min(s))


def test_score_clamp(rng):
    """`score_clamp` bounds the det-loss value landscape: scores cap at
    the clamp (zero gradient past it) and rows below it are bit-identical
    (0 = reference)."""
    n, k, d = 40, 6, 8
    neigh = rng.integers(0, n, (n, k)).astype(np.int32)
    cloud_inds = np.zeros(n, np.int32)
    mask = np.ones(n, bool)
    # drive one row's channels strongly negative: with the sign-preserved
    # beta denominator its score is a large POSITIVE alpha*|f|/|denom|
    feats = rng.standard_normal((n, d)).astype(np.float32)
    feats[7] = -np.abs(feats[7]) * 50.0 - 10.0

    def scores(clamp):
        return detection_scores(jnp.asarray(neigh), jnp.asarray(cloud_inds),
                                jnp.asarray(mask), jnp.asarray(feats),
                                num_clouds=1, beta_floor=0.01,
                                score_clamp=clamp)
    s_ref = np.asarray(scores(0.0))
    assert s_ref.max() > 3.0          # the runaway row actually runs away
    s_cl = np.asarray(scores(3.0))
    assert s_cl.max() <= 3.0
    below = s_ref[:, 0] < 3.0
    np.testing.assert_array_equal(s_cl[below], s_ref[below])

    # the clamp kills the runaway gradient: d(sum scores)/d(features) on
    # the clamped row is exactly zero
    g = jax.grad(lambda x: jnp.sum(detection_scores(
        jnp.asarray(neigh), jnp.asarray(cloud_inds), jnp.asarray(mask),
        x, num_clouds=1, beta_floor=0.01, score_clamp=3.0)))(
            jnp.asarray(feats))
    assert np.isfinite(np.asarray(g)).all()

    # healthy rows: every row's channel max clears the floor -> no-op
    healthy = np.abs(rng.standard_normal((n, d)).astype(np.float32)) + 0.5
    s_ref = detection_scores(jnp.asarray(neigh), jnp.asarray(cloud_inds),
                             jnp.asarray(mask), jnp.asarray(healthy),
                             num_clouds=1, beta_floor=0.0)
    s_floor = detection_scores(jnp.asarray(neigh), jnp.asarray(cloud_inds),
                               jnp.asarray(mask), jnp.asarray(healthy),
                               num_clouds=1, beta_floor=0.01)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_floor))


def test_param_count_flagship():
    """Flagship config has the reference's ~14M params (SURVEY.md §2.9)."""
    cfg = threedmatch_config(max_points=2048, size_multiple=64,
                             level_capacity_ratio=1.0, level_capacity_ratios=())
    pyr = two_cloud_pyramid(np.random.default_rng(0), cfg, 300, 250)
    model = KPFCNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), pyr, training=False)
    n_params = sum(x.size for x in jax.tree.leaves(variables['params']))
    assert 10e6 < n_params < 20e6, n_params


def test_inception_blocks_rejected(rng):
    """inception_deformable* crashes in the reference registry itself
    (`network_blocks.py:1009,1021`); we reject it loudly. Working
    deformable blocks are covered in tests/test_deform.py."""
    cfg = tiny_config(architecture=(
        'simple', 'inception_deformable', 'resnetb_strided',
        'nearest_upsample', 'last_unary'))
    pyr = two_cloud_pyramid(rng, cfg)
    with pytest.raises(NotImplementedError):
        KPFCNN(cfg).init(jax.random.PRNGKey(0), pyr, training=False)
