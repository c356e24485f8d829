"""Inverse-list gather: forward identity, backward == autodiff scatter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3feat_tpu.ops.gather import gather_rows, inverse_lists


def brute_inverse(inds, n_rows):
    flat = inds.reshape(-1)
    out = [[] for _ in range(n_rows)]
    for j, m in enumerate(flat):
        out[m].append(j)
    return out


def test_inverse_lists_match_bruteforce(rng):
    n, k, rows = 50, 6, 31
    inds = rng.integers(0, rows, (n, k)).astype(np.int32)
    inv = inverse_lists(inds, rows, k_inv=32)
    want = brute_inverse(inds, rows)
    flat_pad = n * k
    for m in range(rows):
        got = [x for x in inv[m] if x != flat_pad]
        assert sorted(got) == sorted(want[m])


def test_inverse_lists_overflow_raises(rng):
    inds = np.zeros((20, 4), np.int32)  # row 0 has in-degree 80
    with pytest.raises(ValueError, match='in-degree'):
        inverse_lists(inds, 5, k_inv=8)


def test_gather_rows_forward(rng):
    table = rng.standard_normal((33, 16)).astype(np.float32)
    inds = rng.integers(0, 33, (20, 5)).astype(np.int32)
    inv = inverse_lists(inds, 33, 16)
    got = np.asarray(gather_rows(jnp.asarray(table), jnp.asarray(inds),
                                 jnp.asarray(inv)))
    np.testing.assert_array_equal(got, table[inds])


def test_gather_rows_grad_matches_autodiff(rng):
    n, k, rows, c = 40, 7, 25, 8
    table = rng.standard_normal((rows, c)).astype(np.float32)
    inds = rng.integers(0, rows, (n, k)).astype(np.int32)
    # include shadow entries pointing at the last row
    inds[rng.random((n, k)) < 0.2] = rows - 1
    inv = inverse_lists(inds, rows, 64)
    co = rng.standard_normal((n, k, c)).astype(np.float32)

    def loss_plain(t):
        return jnp.sum(t[jnp.asarray(inds)] * co)

    def loss_custom(t):
        return jnp.sum(gather_rows(t, jnp.asarray(inds), jnp.asarray(inv))
                       * co)

    g_plain = np.asarray(jax.grad(loss_plain)(jnp.asarray(table)))
    g_custom = np.asarray(jax.grad(loss_custom)(jnp.asarray(table)))
    # the last (shadow) row's cotangent is truncated by contract — callers
    # always discard it; all real rows must match autodiff
    np.testing.assert_allclose(g_custom[:-1], g_plain[:-1],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_train_step_grads_match_with_inverse(rng):
    """Full train-step gradients must be identical (up to float noise) with
    and without the inverse-gather backward."""
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.batching import make_training_batch
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.train.trainer import create_train_state, make_train_step

    kw = dict(max_points=512, size_multiple=64, level_capacity_ratio=1.0,
              level_capacity_ratios=(), first_features_dim=8,
              out_features_dim=8, neighborhood_limits=(8, 8, 8, 8, 8),
              keypts_num=16, compute_dtype='float32')
    cfg_inv = threedmatch_config(**kw, train_inverse_gather=True)
    cfg_plain = threedmatch_config(**kw, train_inverse_gather=False)

    n = 150
    anc = (rng.random((n, 3)) * 2).astype(np.float32)
    corr = np.stack([np.arange(n)] * 2, 1)
    b_inv = make_training_batch(anc, anc + 0.001, corr, cfg_inv,
                                rng=np.random.default_rng(3), augment=False)
    b_plain = make_training_batch(anc, anc + 0.001, corr, cfg_plain,
                                  rng=np.random.default_rng(3),
                                  augment=False)
    assert 'inv_neighbors' in b_inv['pyramid']
    assert 'inv_neighbors' not in b_plain['pyramid']

    _, variables = init_kpfcnn(cfg_inv, b_inv['pyramid'])
    s1 = create_train_state(cfg_inv, variables)
    s2 = create_train_state(cfg_plain, variables)
    s1, m1 = make_train_step(cfg_inv)(s1, b_inv)
    s2, m2 = make_train_step(cfg_plain)(s2, b_plain)
    np.testing.assert_allclose(float(m1['total']), float(m2['total']),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
