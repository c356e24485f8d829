"""D3Feat-TPU: a TPU-native joint 3D keypoint detector + descriptor framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of D3Feat
(CVPR'20, reference implementation: XuyangBai/D3Feat, TF1 + CUDA/C++ CPU ops).

Design stance (vs. the reference):
  * Everything with data-dependent shapes (voxel subsampling, radius
    neighbor search, batching) lives in a host-side preprocessing stage
    that emits fixed-shape, padded, masked arrays (`d3feat_tpu.data.pyramid`).
  * The whole network (KPConv pyramid + detection head) is one jitted XLA
    program over those static shapes (`d3feat_tpu.models.kpfcnn`).
  * The hot KPConv op has a fused Pallas TPU kernel
    (`d3feat_tpu.ops.kpconv_pallas`) and a pure-jnp reference path.
  * Scaling is via `jax.sharding.Mesh` data parallelism
    (`d3feat_tpu.parallel`), not sessions/NCCL.
"""

__version__ = "0.1.0"


def _enable_persistent_compile_cache():
    """XLA executables cache to disk keyed by HLO hash, shared across
    processes (`jax_compilation_cache_dir`).  Measured over the axon
    remote-compile tunnel: a cross-process recompile drops 146 s -> 3 s
    — this is what makes subprocess-per-snapshot watcher evals and
    repeated script launches affordable (each otherwise pays 1-2 min of
    remote compile per size bucket).  Opt-out (set it to '') or
    redirect with the standard JAX_COMPILATION_CACHE_DIR env var.
    tests/conftest.py opts out: XLA:CPU AOT cache entries bake in host
    codegen feature flags (+prefer-no-scatter etc.) that are NOT part
    of the cache key, and cross-process reuse on this machine produced
    ~1e-3-level numeric drift plus SIGILL warnings — the persistent
    cache is for the (remote-compiled) TPU programs."""
    import os
    if os.environ.get('JAX_COMPILATION_CACHE_DIR') is not None:
        return                # user already chose a cache ('' = off)
    import jax
    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                'jax_compilation_cache_dir',
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), '.jax_cache'))
    except Exception:               # cache is an optimization, never fatal
        pass


_enable_persistent_compile_cache()

from d3feat_tpu.config import Config  # noqa: F401,E402
