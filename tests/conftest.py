"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon, so
env vars are captured before conftest runs; override via jax.config instead.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: the suite is compile-dominated (every jitted
# train-step variant recompiles ~30-60 s on CPU); warm runs skip all of it.
# OWN directory, never shared with the axon-env processes' .jax_cache:
# XLA:CPU AOT entries bake in host codegen feature flags that are NOT part
# of the cache key, and mixed-writer reuse produced ~1e-3 numeric drift +
# SIGILL warnings (round 5, test_resident_dp_matches_dp).
_cache_dir = os.path.join(os.path.dirname(__file__), '..', '.jax_cache_cpu')
jax.config.update('jax_compilation_cache_dir', os.path.abspath(_cache_dir))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
jax.config.update('jax_persistent_cache_enable_xla_caches',
                  'xla_gpu_per_fusion_autotune_cache_dir')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_cloud(rng, n, scale=1.0):
    return (rng.random((n, 3)) * scale).astype(np.float32)
