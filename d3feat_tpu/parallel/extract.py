"""Mesh-data-parallel dense extraction: fragments sharded across devices.

The reference extracts test fragments strictly one at a time on one GPU
(`utils/tester.py:177-233`).  This module is the inference-side *new
capability*: a batch of D fragments is sharded one-per-device along a
'data' mesh axis; each device builds its own multiscale pyramid ON DEVICE
(`data/pyramid_device.py`) and runs the forward, so the host ships only
raw padded points ([D, cap, 3]) and receives descriptors + scores.  With
the device-resident pyramid there is no per-fragment host geometry at
all, so extraction throughput scales linearly with mesh size.

Replication/sharding layout: variables replicated, fragments sharded —
the same layout as DP training (`parallel/data_parallel.py`), expressed
with NamedSharding + jit so XLA partitions the whole program (there are
no cross-fragment collectives; this is embarrassingly parallel and rides
ICI only for the initial shard scatter).

Validated by tests/test_parallel_extract.py on a virtual 8-device CPU
mesh: sharded outputs == the single-device DescriptorExtractor per
fragment.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from d3feat_tpu.config import Config
from d3feat_tpu.data.pyramid_device import build_pyramid_device
from d3feat_tpu.models.kpfcnn import KPFCNN


def make_dp_extract(config: Config, mesh: Mesh, axis: str = 'data',
                    cell_ratio: float = 0.45, cand_cap: int = 160):
    """Build extract(variables, points [D, cap, 3], ns [D]) ->
    (desc [D, cap, 32], scores [D, cap], ok [D, 3] per-axis flags).

    D must be a multiple of the mesh size.  `config.max_points` fixes the
    per-fragment capacity (pad rows at 1e6).  ok[i].all() False means fragment
    i overflowed a static search cap and must be retried (bigger
    cell_ratio / cand_cap, or the host path) — same contract as
    `runtime.tester.DescriptorExtractor`.
    """
    model = KPFCNN(config)
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def one(points, n):
        pyramid, ok = build_pyramid_device(points, n, config,
                                           cell_ratio=cell_ratio,
                                           cand_cap=cand_cap)
        return pyramid, ok

    @jax.jit
    def extract(variables, points, ns):
        def per_fragment(p, n):
            pyramid, ok = one(p, n)
            desc, score = model.apply(variables, pyramid, training=False)
            return desc, score[:, 0], ok

        return jax.vmap(per_fragment)(points, ns)

    def run(variables, points: np.ndarray, ns: np.ndarray):
        d = points.shape[0]
        if d % mesh.devices.size:
            raise ValueError(f'{d} fragments not a multiple of mesh size '
                             f'{mesh.devices.size}')
        points = jax.device_put(points, shard)
        ns = jax.device_put(np.asarray(ns, np.int32), shard)
        variables = jax.device_put(variables, repl)
        return extract(variables, points, ns)

    return run


def generate_descriptors_dp(
    config: Config,
    variables: Dict,
    fragments,
    out_root: str,
    experiment: str,
    mesh: Mesh,
) -> str:
    """Mesh-DP version of `runtime.generate_descriptors`: D fragments per
    sharded program (one per device, pyramids built on device), reference
    dump layout.  Fragments that overflow the static device-pyramid caps
    fall back to the single-device extractor's retry ladder, so output is
    never silently degraded.
    """
    import time

    from d3feat_tpu.runtime.tester import (DescriptorExtractor, _bucket,
                                           _experiment_dirs, dump_fragment,
                                           path_signature, write_dump_meta)

    frags = list(fragments)
    base, dirs = _experiment_dirs(out_root, experiment)
    write_dump_meta(base, path_signature(config, 'device'))
    if not frags:
        return base
    d = int(mesh.devices.size)
    cap = _bucket(max(len(p) for _, _, p in frags), config.size_multiple)
    cfg = config.replace(max_points=cap)
    run = make_dp_extract(cfg, mesh)
    fallback = None
    times = []
    for g0 in range(0, len(frags), d):
        group = frags[g0:g0 + d]
        # short last group: pad with repeats of the last fragment
        padded_group = group + [group[-1]] * (d - len(group))
        points, ns = pad_fragments([p for _, _, p in padded_group], cap)
        t0 = time.perf_counter()
        desc, score, ok = run(variables, points, ns)
        desc, score, ok = (np.asarray(jax.device_get(desc)),
                           np.asarray(jax.device_get(score)),
                           np.asarray(jax.device_get(ok)))
        times.append((time.perf_counter() - t0) / len(group))
        for i, (scene, frag_id, pts) in enumerate(group):
            n = len(pts)
            if ok[i].all():
                dump_fragment(dirs, scene, frag_id, pts,
                              desc[i, :n], score[i, :n])
            else:
                if fallback is None:
                    fallback = DescriptorExtractor(config, variables,
                                                   device_pyramid=True)
                fdesc, fscore = fallback.extract(pts)
                dump_fragment(dirs, scene, frag_id, pts, fdesc, fscore)
    print(f'Average feature extraction time: {np.mean(times):.3f} s '
          f'({d}-device mesh)')
    return base


def pad_fragments(clouds: List[np.ndarray], cap: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-size clouds into ([D, cap, 3] @ 1e6 padding, [D])."""
    d = len(clouds)
    out = np.full((d, cap, 3), 1e6, np.float32)
    ns = np.zeros((d,), np.int32)
    for i, c in enumerate(clouds):
        if c.shape[0] > cap:
            raise ValueError(f'fragment {i}: {c.shape[0]} > cap {cap}')
        out[i, :c.shape[0]] = c
        ns[i] = c.shape[0]
    return out, ns
