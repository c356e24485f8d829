"""On-chip attribution of the dense-forward cost at bench shapes.

Times jitted variants of the flagship forward with the bench fragment
(100k pts) using the chained-execution marginal-cost discipline from
bench.py (block_until_ready is a no-op on the axon tunnel):

  * full        — descriptors + detection scores (what bench.py times)
  * desc_only   — probe sums only the descriptors: XLA dead-code
                  eliminates the detection head -> Delta = head cost
  * score_f32   — full with score_dtype='float32' (the f32-head cost)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_forward.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from bench import surface_fragment, N_POINTS
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.batching import make_test_batch
    from d3feat_tpu.models import init_kpfcnn

    rng = np.random.default_rng(0)
    cloud = surface_fragment(rng, N_POINTS)
    cfg = threedmatch_config(size_multiple=1024,
                             max_points=-(-N_POINTS // 1024) * 1024)
    batch = make_test_batch(cloud, cfg)
    pyramid = jax.device_put(batch['pyramid'])

    model, variables = init_kpfcnn(cfg, batch['pyramid'])
    cfg32 = cfg.replace(score_dtype='float32')
    from d3feat_tpu.models.kpfcnn import KPFCNN
    model32 = KPFCNN(cfg32)

    def probe_full(v, p):
        d, s = model.apply(v, p, training=False)
        return jnp.sum(d) + jnp.sum(s)

    def probe_desc(v, p):
        d, s = model.apply(v, p, training=False)
        return jnp.sum(d)

    def probe_f32(v, p):
        d, s = model32.apply(v, p, training=False)
        return jnp.sum(d) + jnp.sum(s)

    def measure(name, fn):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f(variables, pyramid))
        compile_s = time.perf_counter() - t0

        def chain(n):
            out = None
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(variables, pyramid)
            float(out)
            return (time.perf_counter() - t0) * 1e3

        chain(3)
        est = []
        for _ in range(3):
            t1 = chain(1)
            tn = chain(20)
            est.append((tn - t1) / 19)
        ms = min(est)
        print(f'{name:12s} {ms:7.2f} ms   (compile {compile_s:.0f} s, '
              f'estimates {[round(e, 2) for e in est]})', flush=True)
        return ms

    full = measure('full', probe_full)
    desc = measure('desc_only', probe_desc)
    f32h = measure('score_f32', probe_f32)
    print(f'head (bf16): {full - desc:.2f} ms   '
          f'head (f32): {f32h - desc:.2f} ms')


if __name__ == "__main__" and not os.environ.get("STAGES"):
    main()


def stages():
    """Time truncated-architecture variants: encoder prefix costs."""
    import jax
    import jax.numpy as jnp
    from bench import surface_fragment, N_POINTS
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.batching import make_test_batch
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.models.kpfcnn import KPFCNN

    rng = np.random.default_rng(0)
    cloud = surface_fragment(rng, N_POINTS)
    base = threedmatch_config(size_multiple=1024,
                              max_points=-(-N_POINTS // 1024) * 1024)
    batch = make_test_batch(cloud, base)
    pyramid = jax.device_put(batch['pyramid'])
    arch = list(base.architecture)
    cuts = {
        'L0_simple': arch[:1],
        'L0_core': arch[:2],                     # + resnetb conv2@L0
        'enc_L1': arch[:4],                      # + strided, resnetb@L1
        'enc_full': arch[:arch.index('nearest_upsample')],
        'desc_full': arch,
    }
    prev = 0.0
    for name, a in cuts.items():
        cfg = base.replace(architecture=tuple(a))
        model, variables = init_kpfcnn(cfg, batch['pyramid'])

        def probe(v, p, model=model):
            out = model.apply(v, p, training=False)
            d = out[0] if isinstance(out, tuple) else out
            return jnp.sum(d)

        f = jax.jit(probe)
        import time as _t
        t0 = _t.perf_counter(); float(f(variables, pyramid))
        comp = _t.perf_counter() - t0

        def chain(n):
            out = None
            t0 = _t.perf_counter()
            for _ in range(n):
                out = f(variables, pyramid)
            float(out)
            return (_t.perf_counter() - t0) * 1e3

        chain(3)
        est = [0.0] * 2
        for i in range(2):
            t1 = chain(1); tn = chain(20)
            est[i] = (tn - t1) / 19
        ms = min(est)
        print(f'{name:10s} {ms:7.2f} ms  (+{ms - prev:6.2f})  '
              f'compile {comp:.0f}s', flush=True)
        prev = ms


if __name__ == '__main__' and os.environ.get('STAGES'):
    stages()
