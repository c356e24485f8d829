"""Microbenchmarks for the exact detection-head and conv2 patterns.

The first microbench round showed gather+FULL-reduce at 8.2 ms vs 14.3 ms
for gather+einsum (3.6M rows); this one isolates the realistic patterns:
axis-1-only sums (the head mean keeps [N, L]), the full head math, and the
KPConv einsum chain, to see which formulation XLA actually fuses.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_head.py
"""

import time

import numpy as np

N_Q = 100352
K = 36
P = 15
ITERS = 10


def timeit(fn, *args):
    import jax
    f = jax.jit(fn)
    float(f(*args))
    t0 = time.perf_counter()
    for _ in range(2):
        out = f(*args)
    float(out)
    chain1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 + ITERS):
        out = f(*args)
    float(out)
    return (time.perf_counter() - t0 - chain1) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    print(f'devices: {jax.devices()}', flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_Q, (N_Q, K), dtype=np.int32))
    tbl = jnp.asarray(rng.standard_normal((N_Q + 1, 128), np.float32),
                      dtype=jnp.bfloat16)
    feats = jnp.asarray(rng.standard_normal((N_Q, 32), np.float32))
    w_npk = jnp.asarray(rng.standard_normal((N_Q, P, K), np.float32),
                        dtype=jnp.bfloat16)
    kw = jnp.asarray(rng.standard_normal((P, 128, 64), np.float32),
                     dtype=jnp.bfloat16)

    def p(name, ms):
        print(f'{name:34s} {ms:7.2f} ms', flush=True)

    # scalar reduce (round-1 shape) for calibration
    p('gather + full reduce', timeit(
        lambda t, i: jnp.sum(jnp.sum(t[i].astype(jnp.float32))), tbl, idx))

    # axis-1 sum only -> [N, 128]
    p('gather + sumK -> [N,128]', timeit(
        lambda t, i: jnp.sum(jnp.square(
            jnp.sum(t[i].astype(jnp.float32), axis=1))), tbl, idx))

    # axis-1 sum, bf16 accumulation
    p('gather + sumK bf16 acc', timeit(
        lambda t, i: jnp.sum(jnp.square(
            jnp.sum(t[i], axis=1).astype(jnp.float32))), tbl, idx))

    # dot-general formulation: ones-weights matvec over K
    ones_k = jnp.ones((K,), jnp.bfloat16)
    p('gather + dot(ones_k)', timeit(
        lambda t, i, o: jnp.sum(jnp.square(jnp.einsum(
            'k,nkl->nl', o, t[i],
            preferred_element_type=jnp.float32))), tbl, idx, ones_k))

    # full current head (mask count)
    def head_new(t, i, f):
        d = f.shape[1]
        nf = t[i]
        nsum = jnp.sum(nf.astype(jnp.float32), axis=1)
        nnum = jnp.maximum(jnp.sum((i < N_Q).astype(jnp.float32), -1,
                                   keepdims=True), 1.0)
        mean = nsum[:, :d] / nnum
        alpha = jax.nn.softplus(f - mean)
        beta = f / (1e-6 + jnp.max(f, 1, keepdims=True))
        return jnp.sum(jnp.max(alpha * beta, 1))

    p('head (mask count)', timeit(head_new, tbl, idx, feats))

    # old head: count from gathered channel sums
    def head_old(t, i, f):
        d = f.shape[1]
        nf = t[i].astype(jnp.float32)
        nsum_k = jnp.sum(nf, axis=-1)
        nnum = jnp.maximum(jnp.sum((nsum_k != 0).astype(jnp.float32), -1,
                                   keepdims=True), 1.0)
        mean = jnp.sum(nf, axis=1)[:, :d] / nnum
        alpha = jax.nn.softplus(f - mean)
        beta = f / (1e-6 + jnp.max(f, 1, keepdims=True))
        return jnp.sum(jnp.max(alpha * beta, 1))

    p('head (channel-sum count)', timeit(head_old, tbl, idx, feats))

    # conv2 chain (current kpconv_apply shape)
    def conv2(t, i, w, k):
        nf = t[i]
        wf = jnp.einsum('npk,nkl->npl', w, nf,
                        preferred_element_type=jnp.float32)
        out = jnp.einsum('npl,plo->no', wf.astype(jnp.bfloat16), k,
                         preferred_element_type=jnp.float32)
        fs = jnp.sum(nf.astype(jnp.float32), axis=-1)
        nn = jnp.maximum(jnp.sum((fs > 0).astype(jnp.float32), -1), 1.0)
        return jnp.sum(out / nn[:, None])

    p('conv2 einsum chain (current)', timeit(conv2, tbl, idx, w_npk, kw))

    # conv2 without the density-count re-read
    def conv2_nocount(t, i, w, k):
        nf = t[i]
        wf = jnp.einsum('npk,nkl->npl', w, nf,
                        preferred_element_type=jnp.float32)
        out = jnp.einsum('npl,plo->no', wf.astype(jnp.bfloat16), k,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out)

    p('conv2 einsum no count', timeit(conv2_nocount, tbl, idx, w_npk, kw))

    # conv2 single fused contraction npk,nkl,plo->no
    def conv2_onehot(t, i, w, k):
        out = jnp.einsum('npk,nkl,plo->no', w, t[i], k,
                         preferred_element_type=jnp.float32)
        return jnp.sum(out)

    p('conv2 single einsum', timeit(conv2_onehot, tbl, idx, w_npk, kw))


if __name__ == '__main__' and __import__('sys').argv[-1] != 'round3':
    main()


def round3():
    """32-lane head table + bf16 accumulation variants."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N_Q, (N_Q, K), dtype=np.int32))
    tbl32 = jnp.asarray(rng.standard_normal((N_Q + 1, 32), np.float32),
                        dtype=jnp.bfloat16)
    tbl128 = jnp.asarray(rng.standard_normal((N_Q + 1, 128), np.float32),
                         dtype=jnp.bfloat16)
    feats = jnp.asarray(rng.standard_normal((N_Q, 32), np.float32))
    w_npk = jnp.asarray(rng.standard_normal((N_Q, P, K), np.float32),
                        dtype=jnp.bfloat16)
    kw32 = jnp.asarray(rng.standard_normal((P, 32, 64), np.float32),
                       dtype=jnp.bfloat16)
    kw128 = jnp.asarray(rng.standard_normal((P, 128, 64), np.float32),
                        dtype=jnp.bfloat16)

    def p(name, ms):
        print(f'{name:34s} {ms:7.2f} ms', flush=True)

    p('sumK [N,32] f32 acc', timeit(
        lambda t, i: jnp.sum(jnp.square(
            jnp.sum(t[i].astype(jnp.float32), axis=1))), tbl32, idx))
    p('sumK [N,32] bf16 acc', timeit(
        lambda t, i: jnp.sum(jnp.square(
            jnp.sum(t[i], axis=1).astype(jnp.float32))), tbl32, idx))
    p('sumK [N,128] bf16 acc (repeat)', timeit(
        lambda t, i: jnp.sum(jnp.square(
            jnp.sum(t[i], axis=1).astype(jnp.float32))), tbl128, idx))

    def head(t, i, f, acc):
        d = f.shape[1]
        nf = t[i]
        if acc == 'f32':
            nsum = jnp.sum(nf.astype(jnp.float32), axis=1)
        else:
            nsum = jnp.sum(nf, axis=1).astype(jnp.float32)
        nnum = jnp.maximum(jnp.sum((i < N_Q).astype(jnp.float32), -1,
                                   keepdims=True), 1.0)
        mean = nsum[:, :d] / nnum
        alpha = jax.nn.softplus(f - mean)
        beta = f / (1e-6 + jnp.max(f, 1, keepdims=True))
        return jnp.sum(jnp.max(alpha * beta, 1))

    p('head 32-lane bf16 acc', timeit(
        lambda t, i, f: head(t, i, f, 'bf16'), tbl32, idx, feats))
    p('head 32-lane f32 acc', timeit(
        lambda t, i, f: head(t, i, f, 'f32'), tbl32, idx, feats))
    p('head 128-lane bf16 acc', timeit(
        lambda t, i, f: head(t, i, f, 'bf16'), tbl128, idx, feats))

    def conv2(t, i, w, k, pref):
        nf = t[i]
        wf = jnp.einsum('npk,nkl->npl', w, nf,
                        preferred_element_type=pref)
        out = jnp.einsum('npl,plo->no', wf.astype(jnp.bfloat16), k,
                         preferred_element_type=jnp.float32)
        fs = jnp.sum(nf.astype(jnp.float32), axis=-1)
        nn = jnp.maximum(jnp.sum((fs > 0).astype(jnp.float32), -1), 1.0)
        return jnp.sum(out / nn[:, None])

    p('conv2 128-lane bf16 acc', timeit(
        lambda t, i, w, k: conv2(t, i, w, k, jnp.bfloat16),
        tbl128, idx, w_npk, kw128))
    p('conv2 32-lane f32 acc', timeit(
        lambda t, i, w, k: conv2(t, i, w, k, jnp.float32),
        tbl32, idx, w_npk, kw32))
    p('conv2 32-lane bf16 acc', timeit(
        lambda t, i, w, k: conv2(t, i, w, k, jnp.bfloat16),
        tbl32, idx, w_npk, kw32))


if __name__ == '__main__' and __import__('sys').argv[-1] == 'round3':
    round3()
