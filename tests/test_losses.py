"""Golden tests for losses vs numpy re-executions of utils/loss.py."""

import numpy as np
import jax.numpy as jnp

from d3feat_tpu.train import (cdist, circle_loss, contrastive_loss,
                              d3feat_loss, det_loss)


def np_softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def np_logsumexp(x, axis):
    m = x.max(axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
            ).squeeze(axis)


def oracle_circle(dists, fn_mask, pos_margin=0.1, neg_margin=1.4,
                  log_scale=25.0):
    """utils/loss.py:126-182 with positiveIDS = range(n)."""
    n = dists.shape[0]
    eye = np.eye(n, dtype=bool)
    fp = np.max(dists * eye, axis=1)
    lse_pos = log_scale * (fp - pos_margin)
    neg = dists + 1e8 * fn_mask + 1e8 * eye
    lse_neg = np_logsumexp(
        log_scale * (neg_margin - neg) * np.maximum(0, neg_margin - neg),
        axis=-1)
    loss = np_softplus(lse_pos + lse_neg) / log_scale
    cn = np.min(dists + 1e5 * eye, axis=1)
    acc = np.mean(fp - cn <= 0)
    return loss.mean(), acc


def oracle_contrastive(dists, fn_mask, pos_margin=0.1, neg_margin=1.4):
    """utils/loss.py:83-123."""
    n = dists.shape[0]
    eye = np.eye(n, dtype=bool)
    fp = np.max(dists * eye, axis=1)
    cn = np.min(dists + 1e5 * eye, axis=1)
    loss = np.maximum(fp - pos_margin, 0) + np.maximum(neg_margin - cn, 0)
    return loss.mean()


def oracle_det(dists, s1, s2):
    """utils/loss.py:185-195."""
    n = dists.shape[0]
    eye = np.eye(n, dtype=bool)
    fp = np.max(dists * eye, axis=1)
    cn = np.min(dists + 1e5 * eye, axis=1)
    return np.mean((fp - cn)[:, None] * (s1 + s2 + 1e-6))


def _rand_dists(rng, n=32):
    a = rng.standard_normal((n, 8)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b = a + 0.1 * rng.standard_normal((n, 8)).astype(np.float32)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return np.asarray(cdist(jnp.asarray(a), jnp.asarray(b)))


def test_cdist_oracle(rng):
    a = rng.standard_normal((10, 4)).astype(np.float32)
    b = rng.standard_normal((7, 4)).astype(np.float32)
    got = np.asarray(cdist(jnp.asarray(a), jnp.asarray(b)))
    want = np.sqrt(((a[:, None] - b[None]) ** 2).sum(-1) + 1e-12)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got2 = np.asarray(cdist(jnp.asarray(a), jnp.asarray(b), 'sqeuclidean'))
    np.testing.assert_allclose(got2, ((a[:, None] - b[None]) ** 2).sum(-1),
                               rtol=2e-4, atol=1e-6)


def test_circle_loss_no_fn_no_pad(rng):
    d = _rand_dists(rng)
    n = d.shape[0]
    fn = np.zeros((n, n), bool)
    valid = np.ones(n, bool)
    got = circle_loss(jnp.asarray(d), jnp.asarray(valid), jnp.asarray(fn))
    want_loss, want_acc = oracle_circle(d, fn)
    np.testing.assert_allclose(float(got['loss']), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(got['accuracy']), want_acc, rtol=1e-6)


def test_circle_loss_false_negatives(rng):
    d = _rand_dists(rng)
    n = d.shape[0]
    fn = rng.random((n, n)) < 0.2
    np.fill_diagonal(fn, False)
    valid = np.ones(n, bool)
    got = circle_loss(jnp.asarray(d), jnp.asarray(valid), jnp.asarray(fn))
    want_loss, _ = oracle_circle(d, fn)
    np.testing.assert_allclose(float(got['loss']), want_loss, rtol=1e-5)


def test_circle_loss_padding_matches_smaller_problem(rng):
    """Padding with invalid correspondences must equal the unpadded loss."""
    d_small = _rand_dists(rng, n=16)
    fn = np.zeros((16, 16), bool)
    want = circle_loss(jnp.asarray(d_small), jnp.ones(16, bool),
                       jnp.asarray(fn))

    pad = 8
    d_big = np.full((24, 24), 0.5, np.float32)
    d_big[:16, :16] = d_small
    valid = np.concatenate([np.ones(16, bool), np.zeros(pad, bool)])
    got = circle_loss(jnp.asarray(d_big), jnp.asarray(valid),
                      jnp.zeros((24, 24), bool))
    np.testing.assert_allclose(float(got['loss']), float(want['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got['accuracy']),
                               float(want['accuracy']), rtol=1e-6)


def test_contrastive_oracle(rng):
    d = _rand_dists(rng)
    n = d.shape[0]
    got = contrastive_loss(jnp.asarray(d), jnp.ones(n, bool),
                           jnp.zeros((n, n), bool))
    np.testing.assert_allclose(float(got['loss']),
                               oracle_contrastive(d, None), rtol=1e-5)


def test_det_loss_oracle(rng):
    d = _rand_dists(rng)
    n = d.shape[0]
    s1 = rng.random((n, 1)).astype(np.float32)
    s2 = rng.random((n, 1)).astype(np.float32)
    got = det_loss(jnp.asarray(d), jnp.asarray(s1), jnp.asarray(s2),
                   jnp.ones(n, bool))
    np.testing.assert_allclose(float(got), oracle_det(d, s1, s2), rtol=1e-5)


def test_d3feat_loss_skip_batch(rng):
    """With fewer than keypts_num/2 valid correspondences, losses are 0 and
    accuracy -1 (models/KPFCNN_model.py:172-186)."""
    m = 32
    desc_a = rng.standard_normal((m, 8)).astype(np.float32)
    desc_p = rng.standard_normal((m, 8)).astype(np.float32)
    s = rng.random((m, 1)).astype(np.float32)
    kd = rng.random((m, m)).astype(np.float32) + 0.2
    valid = np.zeros(m, bool)
    valid[:5] = True  # 5 < 32/2
    out = d3feat_loss(jnp.asarray(desc_a), jnp.asarray(desc_p),
                      jnp.asarray(s), jnp.asarray(s), jnp.asarray(kd),
                      jnp.asarray(valid),
                      safe_radius=0.1, pos_margin=0.1, neg_margin=1.4,
                      log_scale=25.0, det_weight=1.0, keypts_num=32)
    assert float(out['loss']) == 0.0
    assert float(out['accuracy']) == -1.0


def test_d3feat_loss_full(rng):
    m = 32
    desc_a = rng.standard_normal((m, 8)).astype(np.float32)
    desc_a /= np.linalg.norm(desc_a, axis=1, keepdims=True)
    desc_p = desc_a + 0.05 * rng.standard_normal((m, 8)).astype(np.float32)
    desc_p /= np.linalg.norm(desc_p, axis=1, keepdims=True)
    s = (rng.random((m, 1)).astype(np.float32)) * 0.5
    kd = (rng.random((m, m)).astype(np.float32)) * 2 + 0.15
    np.fill_diagonal(kd, 0.0)
    out = d3feat_loss(jnp.asarray(desc_a), jnp.asarray(desc_p),
                      jnp.asarray(s), jnp.asarray(s), jnp.asarray(kd),
                      jnp.ones(m, bool),
                      safe_radius=0.1, pos_margin=0.1, neg_margin=1.4,
                      log_scale=25.0, det_weight=1.0, keypts_num=32)
    d = np.asarray(cdist(jnp.asarray(desc_a), jnp.asarray(desc_p)))
    want_loss, want_acc = oracle_circle(d, np.zeros((m, m), bool))
    want_det = oracle_det(d, s, s)
    np.testing.assert_allclose(float(out['desc_loss']), want_loss, rtol=1e-5)
    np.testing.assert_allclose(float(out['det_loss']), want_det, rtol=1e-5)
    np.testing.assert_allclose(float(out['loss']), want_loss + want_det,
                               rtol=1e-5)
