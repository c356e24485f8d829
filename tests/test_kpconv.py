"""Golden tests for the KPConv op.

Oracle: a literal numpy re-execution of the reference TF graph
(`kernels/convolution_ops.py:161-255`), including the shadow-point/zero-
feature padding and the D3Feat density normalization.
"""

import numpy as np
import pytest

from d3feat_tpu.ops import kpconv
from d3feat_tpu.ops.kernel_points import load_kernel_points, optimize_kernel_points
from d3feat_tpu.ops.kpconv import closest_pool, index_max_pool, unary_conv


def numpy_kpconv(q, s, neigh, feats, kp, kw, extent, influence='linear',
                 mode='sum'):
    n_kp = kp.shape[0]
    s_ext = np.concatenate([s, np.full((1, 3), 1e6, np.float32)], axis=0)
    neighbors = s_ext[neigh] - q[:, None, :]                    # [N,K,3]
    diff = neighbors[:, :, None, :] - kp[None, None, :, :]
    sq = np.sum(diff**2, axis=3)                                # [N,K,P]
    if influence == 'constant':
        w = np.ones_like(sq)
    elif influence == 'linear':
        w = np.maximum(1 - np.sqrt(sq + 1e-10) / (2 * extent), 0.0)
    else:
        sig = extent * 0.3
        w = np.exp(-sq / (2 * sig**2 + 1e-9))
    w = np.transpose(w, (0, 2, 1))                              # [N,P,K]
    if mode == 'closest':
        nearest = np.argmin(sq, axis=2)
        onehot = np.eye(n_kp, dtype=np.float32)[nearest]        # [N,K,P]
        w = w * np.transpose(onehot, (0, 2, 1))
    f_ext = np.concatenate([feats, np.zeros((1, feats.shape[1]), np.float32)])
    nf = f_ext[neigh]                                           # [N,K,C]
    weighted = np.matmul(w, nf)                                 # [N,P,C]
    ko = np.matmul(np.transpose(weighted, (1, 0, 2)), kw)       # [P,N,O]
    out = np.sum(ko, axis=0)
    nsum = np.sum(nf, axis=-1)
    nnum = np.maximum(np.sum(nsum > 0, axis=-1), 1)
    return out / nnum[:, None]


def _setup(rng, n_q=40, n_s=60, k=8, p=15, c_in=5, c_out=7, shadow_frac=0.3):
    q = rng.random((n_q, 3)).astype(np.float32)
    s = rng.random((n_s, 3)).astype(np.float32)
    neigh = rng.integers(0, n_s, size=(n_q, k)).astype(np.int32)
    neigh[rng.random((n_q, k)) < shadow_frac] = n_s             # shadow pads
    feats = rng.standard_normal((n_s, c_in)).astype(np.float32)
    kp = load_kernel_points(0.15, p, seed=3)
    kw = rng.standard_normal((p, c_in, c_out)).astype(np.float32) * 0.1
    return q, s, neigh, feats, kp, kw


@pytest.mark.parametrize('influence', ['constant', 'linear', 'gaussian'])
@pytest.mark.parametrize('mode', ['sum', 'closest'])
def test_kpconv_matches_reference_math(rng, influence, mode):
    q, s, neigh, feats, kp, kw = _setup(rng)
    got = np.asarray(kpconv(q, s, neigh, feats, kp, kw, 0.1,
                            kp_influence=influence, aggregation_mode=mode))
    want = numpy_kpconv(q, s, neigh, feats, kp, kw, 0.1, influence, mode)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_all_shadow_row_is_zero(rng):
    q, s, neigh, feats, kp, kw = _setup(rng)
    neigh[0, :] = s.shape[0]
    got = np.asarray(kpconv(q, s, neigh, feats, kp, kw, 0.1))
    np.testing.assert_allclose(got[0], 0.0, atol=1e-6)


def test_density_normalization_invariance(rng):
    """Doubling neighbor multiplicity (same points twice) must not change the
    output — the D3Feat density-invariance property."""
    q, s, neigh, feats, kp, kw = _setup(rng, k=6, shadow_frac=0.0)
    feats = np.abs(feats) + 0.1  # keep feature sums positive
    doubled = np.concatenate([neigh, neigh], axis=1)
    out1 = np.asarray(kpconv(q, s, neigh, feats, kp, kw, 0.1))
    out2 = np.asarray(kpconv(q, s, doubled, feats, kp, kw, 0.1))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_unary_conv(rng):
    f = rng.standard_normal((10, 4)).astype(np.float32)
    w = rng.standard_normal((4, 6)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(unary_conv(f, w)), f @ w, rtol=1e-5)


def test_index_max_pool_shadow_never_wins(rng):
    f = rng.standard_normal((5, 3)).astype(np.float32)
    inds = np.array([[0, 1, 5], [2, 5, 5]], np.int32)  # 5 = shadow
    got = np.asarray(index_max_pool(f, inds))
    np.testing.assert_allclose(got[0], np.maximum(f[0], f[1]), rtol=1e-6)
    np.testing.assert_allclose(got[1], f[2], rtol=1e-6)


def test_closest_pool(rng):
    f = rng.standard_normal((4, 3)).astype(np.float32)
    inds = np.array([[2, 0], [4, 4], [1, 3]], np.int32)  # 4 = shadow
    got = np.asarray(closest_pool(f, inds))
    np.testing.assert_allclose(got[0], f[2], rtol=1e-6)
    np.testing.assert_allclose(got[1], 0.0, atol=1e-7)
    np.testing.assert_allclose(got[2], f[1], rtol=1e-6)


def test_fast_path_matches_oracle_f32(rng):
    """influence_weights + kpconv_apply (fast path, f32) must equal the
    reference-path kpconv exactly (same math, different structure)."""
    import jax.numpy as jnp
    from d3feat_tpu.ops.kpconv import (influence_weights, kpconv_apply,
                                       lane_pad_table)
    q, s, neigh, feats, kp, kw = _setup(rng)
    want = np.asarray(kpconv(q, s, neigh, feats, kp, kw, 0.1))
    w = influence_weights(q, s, neigh, kp, 0.1, out_dtype=jnp.float32)
    table = lane_pad_table(feats, jnp.float32)
    got = np.asarray(kpconv_apply(neigh, w, table, kw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fast_path_bf16_close(rng):
    import jax.numpy as jnp
    from d3feat_tpu.ops.kpconv import (influence_weights, kpconv_apply,
                                       lane_pad_table)
    q, s, neigh, feats, kp, kw = _setup(rng)
    want = np.asarray(kpconv(q, s, neigh, feats, kp, kw, 0.1))
    w = influence_weights(q, s, neigh, kp, 0.1, out_dtype=jnp.bfloat16)
    table = lane_pad_table(feats, jnp.bfloat16)
    got = np.asarray(kpconv_apply(neigh, w, table, kw))
    # bf16 relative error ~1e-2
    err = np.abs(got - want) / (np.abs(want) + 1e-2)
    assert err.max() < 0.1, err.max()


def test_kpconv_ones_matches_oracle(rng):
    """Gather-free ones-input conv == reference kpconv on constant-1
    features."""
    import jax.numpy as jnp
    from d3feat_tpu.ops.kpconv import influence_weights, kpconv_ones
    q, s, neigh, _, kp, kw1 = _setup(rng, c_in=1)
    ones = np.ones((s.shape[0], 1), np.float32)
    want = np.asarray(kpconv(q, s, neigh, ones, kp, kw1, 0.1))
    w = influence_weights(q, s, neigh, kp, 0.1, out_dtype=jnp.float32)
    got = np.asarray(kpconv_ones(neigh, w, kw1, s.shape[0]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_influence_weights_from_rel_matches_gather(rng):
    """Host-shipped int16 rel vectors must reproduce the gather-based
    influence weights within quantization tolerance, including shadow
    masking."""
    import jax.numpy as jnp
    from d3feat_tpu.ops.kpconv import (influence_weights,
                                       influence_weights_from_rel)
    q, s, neigh, _, kp, _ = _setup(rng)
    n_s = s.shape[0]
    # the pipeline guarantees |rel| <= search radius; the synthetic random
    # neighbors here span the unit cube, so use a covering radius
    radius = 2.0
    want = np.asarray(influence_weights(q, s, neigh, kp, 0.1,
                                        out_dtype=jnp.float32))
    # quantize rel on host like the pipeline does
    s_ext = np.concatenate([s, np.zeros((1, 3), np.float32)])
    rel = s_ext[neigh] - q[:, None, :]
    relq = np.clip(np.rint(rel * 32767.0 / radius), -32767, 32767
                   ).astype(np.int16)
    relq[neigh == n_s] = 32767
    got = np.asarray(influence_weights_from_rel(
        jnp.asarray(relq), jnp.asarray(neigh), n_s, radius,
        jnp.asarray(kp), 0.1, out_dtype=jnp.float32))
    # shadow entries exactly zero
    assert np.all(got[np.transpose(
        np.broadcast_to((neigh == n_s)[:, None, :], got.shape), (0, 1, 2))]
        == 0.0)
    # valid entries within quantization tolerance
    valid = np.broadcast_to((neigh < n_s)[:, None, :], got.shape)
    np.testing.assert_allclose(got[valid], want[valid], atol=5e-4)


def test_kernel_points_disposition():
    kp = optimize_kernel_points(15, num_tries=8, max_iter=1500, seed=0)
    assert kp.shape == (15, 3)
    np.testing.assert_allclose(kp[0], 0.0, atol=1e-7)  # center pinned
    r = np.linalg.norm(kp[1:], axis=1)
    np.testing.assert_allclose(r.mean(), 1.0, rtol=1e-5)  # normalized
    # points are spread out (no two coincide)
    d = np.linalg.norm(kp[:, None] - kp[None, :], axis=-1)
    d[np.arange(15), np.arange(15)] = 1e9
    assert d.min() > 0.4


def test_load_kernel_points_seeded():
    a = load_kernel_points(0.15, 15, seed=7)
    b = load_kernel_points(0.15, 15, seed=7)
    c = load_kernel_points(0.15, 15, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert np.allclose(a[0], 0.0)  # pinned center survives jitter
    # mean non-center radius ~ 0.15 (within jitter)
    assert abs(np.linalg.norm(a[1:], axis=1).mean() - 0.15) < 0.01


def test_kernel_points_2d():
    """2D dispositions (reference supports dimension=2 in the optimizer,
    `kernels/kernel_points.py:41-181`; its loader's 2D branch is broken —
    returns the kernel unscaled — which we fix rather than reproduce)."""
    from d3feat_tpu.ops.kernel_points import load_kernel_points
    kp = load_kernel_points(0.5, 9, dimension=2, fixed='center', seed=3)
    assert kp.shape == (9, 2)
    assert np.linalg.norm(kp[0]) < 1e-6            # pinned center
    r = np.linalg.norm(kp, axis=1)
    assert r.max() <= 0.5 * 1.6 and r.max() > 0.2  # scaled to radius
    # deterministic under the same seed
    kp2 = load_kernel_points(0.5, 9, dimension=2, fixed='center', seed=3)
    np.testing.assert_array_equal(kp, kp2)
