"""TPU gather microbenchmarks — the two 3.6M-row gathers are the perf floor.

Measures, on the real chip, the candidate replacements for the level-0
feature gathers (resnetb conv2 and the detection head; reference hot path
`kernels/convolution_ops.py:234-247` and `models/D3Feat.py:92-98`):

  * XLA row gathers at several (dtype, lane) layouts, reduced vs einsum-fused;
  * bitcast-packed gathers (bf16 rows viewed as f32/int32 rows of half the
    lanes — dodges dtype-specific gather strategies);
  * a Pallas per-row DMA gather (PERF_NOTES lever #1): rows fetched by the
    DMA engines instead of the vector load unit, with a configurable number
    of in-flight copies. This measures the per-row DMA descriptor overhead.
  * Mosaic `dynamic_gather` capability probe (single- vs multi-vreg).

Timing uses the chained-execution pattern (bench.py): block_until_ready is
a no-op on the axon tunnel, so per-run cost = marginal cost of extra chained
executions before one scalar fetch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_gather.py
"""

import time

import numpy as np

N_Q = 100352          # level-0 capacity used by bench.py
K = 36                # calibrated level-0 neighbor count
N_S = N_Q             # same-level gather (conv / head)
ITERS = 10


def timeit(fn, *args):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    float(out)  # compile + fetch
    t0 = time.perf_counter()
    for _ in range(2):
        out = f(*args)
    float(out)
    t1 = time.perf_counter()
    chain1 = t1 - t0
    t0 = time.perf_counter()
    for _ in range(2 + ITERS):
        out = f(*args)
    float(out)
    t1 = time.perf_counter()
    return (t1 - t0 - chain1) / ITERS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    print(f'devices: {jax.devices()}', flush=True)
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, N_S, size=(N_Q, K), dtype=np.int32)
    idx = jnp.asarray(idx_np)
    ones_w = jnp.ones((N_Q, K), jnp.bfloat16)

    results = {}

    def table(c, dtype):
        t = rng.standard_normal((N_S + 1, c), dtype=np.float32)
        return jnp.asarray(t, dtype=dtype)

    # --- XLA gather variants -------------------------------------------
    for name, c, dt in [
            ('bf16_c128', 128, jnp.bfloat16),
            ('bf16_c64', 64, jnp.bfloat16),
            ('bf16_c32', 32, jnp.bfloat16),
            ('f32_c32', 32, jnp.float32),
            ('f32_c16', 16, jnp.float32),
            ('f32_c8', 8, jnp.float32),
    ]:
        t = table(c, dt)
        ms = timeit(lambda t, i: jnp.sum(jnp.sum(
            t[i].astype(jnp.float32), axis=1)), t, idx)
        results[f'gather_sum_{name}'] = ms
        print(f'gather+sum   {name:12s} {ms:7.2f} ms', flush=True)

    # --- einsum-fused (XLA fuses the gather into the contraction) ------
    for name, c, dt in [('bf16_c128', 128, jnp.bfloat16),
                        ('bf16_c32', 32, jnp.bfloat16)]:
        t = table(c, dt)
        ms = timeit(lambda t, i, w: jnp.sum(jnp.einsum(
            'nk,nkc->nc', w, t[i], preferred_element_type=jnp.float32)),
            t, idx, ones_w)
        results[f'gather_einsum_{name}'] = ms
        print(f'gather+einsum {name:12s} {ms:7.2f} ms', flush=True)

    # --- bitcast packing: bf16 rows viewed as f32/i32 half-lane rows ----
    def packed_gather_sum(t_packed, i):
        g = t_packed[i]                                   # [N, K, C//2] f32
        g = jax.lax.bitcast_convert_type(g, jnp.bfloat16)  # [N, K, C//2, 2]
        return jnp.sum(jnp.sum(g.astype(jnp.float32), axis=(1, 2)))

    for c in (32, 64, 128):
        t = table(c, jnp.bfloat16)
        tp = jax.lax.bitcast_convert_type(
            t.reshape(N_S + 1, c // 2, 2), jnp.float32)
        ms = timeit(packed_gather_sum, tp, idx)
        results[f'gather_packed_f32_c{c // 2}x2'] = ms
        print(f'packed bf16c{c}->f32c{c // 2} {ms:7.2f} ms', flush=True)

    # --- Pallas per-row DMA gather (lever #1) ---------------------------
    try:
        ms = dma_gather_bench(idx_np)
        results.update(ms)
    except Exception as e:  # noqa: BLE001
        print(f'DMA gather failed: {type(e).__name__}: {e}', flush=True)

    # --- Mosaic dynamic_gather capability probe -------------------------
    try:
        probe_dynamic_gather()
    except Exception as e:  # noqa: BLE001
        print(f'dynamic_gather probe: {type(e).__name__}: {e}', flush=True)

    print('\nRESULTS', results, flush=True)


def dma_gather_bench(idx_np):
    """Per-row DMA gather: each grid program copies BLOCK rows HBM->VMEM
    via individually-addressed async copies, DEPTH in flight."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = 128
    BLOCK = 2048
    n_rows = 1 << 18  # 262144 rows: enough to amortize, fits SMEM budget
    flat_idx = idx_np.reshape(-1)[:n_rows].astype(np.int32)
    rng = np.random.default_rng(1)
    tbl = jnp.asarray(rng.standard_normal((N_S + 1, C), dtype=np.float32),
                      dtype=jnp.bfloat16)
    out = {}

    for depth in (4, 8, 16):
        def kernel(idx_ref, tbl_ref, out_ref, sems):
            def get_dma(slot, row):
                return pltpu.make_async_copy(
                    tbl_ref.at[idx_ref[row]],
                    out_ref.at[row % BLOCK],
                    sems.at[slot])

            base = pl.program_id(0) * BLOCK

            def body(i, _):
                row = base + i
                get_dma(i % depth, row).start()

                @pl.when(i >= depth - 1)
                def _():
                    done = row - (depth - 1)
                    get_dma((i + 1) % depth, done).wait()
                return 0

            jax.lax.fori_loop(0, BLOCK, body, 0)
            # drain the tail
            def drain(j, _):
                row = base + BLOCK - (depth - 1) + j
                get_dma((BLOCK - (depth - 1) + j + 1) % depth, row).wait()
                return 0
            jax.lax.fori_loop(0, depth - 1, drain, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_rows // BLOCK,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((BLOCK, C),
                                   lambda i, idx: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        )

        def run(idxs, t):
            g = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((n_rows, C), t.dtype),
                grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True),
            )(idxs, t)
            return jnp.sum(g.astype(jnp.float32))

        try:
            ms = timeit(run, jnp.asarray(flat_idx), tbl)
            rate = n_rows / (ms * 1e-3) / 1e6
            out[f'dma_gather_depth{depth}'] = ms
            print(f'DMA gather depth={depth:2d}: {ms:7.2f} ms '
                  f'({rate:.1f}M rows/s; XLA ~250M rows/s)', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'DMA gather depth={depth} failed: '
                  f'{type(e).__name__}: {e}', flush=True)
            break
    return out


def probe_dynamic_gather():
    """Can Mosaic lower a multi-vreg in-VMEM row gather yet? (jax 0.9:
    'Multiple source vregs along gather dimension' was unsupported.)"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tbl_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tbl_ref[:], idx_ref[:], axis=0)

    tbl = jnp.arange(1024 * 128, dtype=jnp.float32).reshape(1024, 128)
    idx = jnp.arange(256, dtype=jnp.int32) * 3 % 1024
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    res = f(tbl, idx)
    ok = np.allclose(np.asarray(res), np.asarray(tbl)[np.asarray(idx)])
    print(f'dynamic_gather multi-vreg: COMPILED, correct={ok}', flush=True)


if __name__ == '__main__':
    main()
