"""Stage-isolated timing of the on-device pyramid at flagship shapes.

Where does `build_pyramid_device`'s time go?  Staged-truncation
profiling misattributes across XLA rematerialization boundaries
(PERF_NOTES.md), so each stage here is timed as its OWN jitted program
at the exact shapes it sees inside the full build: per-level cell-table
build, conv/pool/upsample searches, the subsample chain, and the full
pyramid for cross-checking the sum.

Timing uses bench.py's tunnel-safe pattern: scalar probe + marginal
cost of chained executions, min over repeats (contention only adds).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_pyramid.py
      [--n 100000] [--iters 10]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def surface_fragment(rng, n, extent=6.0):
    uv = rng.random((n, 2)) * extent
    z = (np.sin(uv[:, 0] * 1.7) * 0.4 + np.cos(uv[:, 1] * 1.3) * 0.3
         + rng.normal(0.0, 0.01, n))
    return np.stack([uv[:, 0], uv[:, 1], z], axis=1).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=100_000)
    ap.add_argument('--iters', type=int, default=10)
    ap.add_argument('--repeats', type=int, default=3)
    ap.add_argument('--cand-cap', type=int, default=240)
    ap.add_argument('--cell-ratio', type=float, default=0.22)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.pyramid import _layer_plan
    from d3feat_tpu.data.pyramid_device import build_pyramid_device
    from d3feat_tpu.ops.device_grid import (build_cell_table,
                                            grid_subsample_device,
                                            radius_search)

    cfg = threedmatch_config(size_multiple=1024,
                             max_points=-(-args.n // 1024) * 1024)
    caps = cfg.level_capacities()
    limits = cfg.neighborhood_limits
    plan = _layer_plan(cfg.architecture)
    host_geom = cfg.host_geometry
    rng = np.random.default_rng(0)
    cloud = surface_fragment(rng, args.n)
    pts0 = np.full((caps[0], 3), 1e6, np.float32)
    pts0[:args.n] = cloud
    pts0 = jax.device_put(jnp.asarray(pts0))
    n0 = jnp.int32(args.n)

    def timed(name, fn, *fn_args):
        """fn must return a scalar (or tuple reduced here)."""
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        float(jf(*fn_args))
        compile_s = time.perf_counter() - t0
        # min singles and min chains SEPARATELY: a tunnel stall during
        # the single run otherwise makes the marginal estimate negative
        singles, chains = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = jf(*fn_args)
            float(out)
            singles.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = jf(*fn_args)
            float(out)
            chains.append(time.perf_counter() - t0)
        ms = (min(chains) - min(singles)) / (args.iters - 1) * 1e3
        print(f'{name:36s} {ms:8.2f} ms   (compile {compile_s:.0f}s)',
              flush=True)
        return ms

    # --- reproduce the build's own level chain (host-side driver) -------
    r0 = cfg.first_subsampling_dl * cfg.KP_extent * 2.5
    dl = cfg.first_subsampling_dl
    num_layers = cfg.num_layers

    @jax.jit
    def sub_chain(p0, n_v):
        pts = [p0]
        ns = [n_v]
        acc = jnp.float32(0)
        for l in range(num_layers - 1):
            sub, n_sub, _ = grid_subsample_device(
                pts[l], ns[l], 2.0 * dl * (2.0 ** l), caps[l + 1])
            pts.append(sub)
            ns.append(n_sub)
            acc += jnp.sum(jnp.where(jnp.isfinite(sub), sub, 0.0))
        return pts, ns, acc

    pts, ns, _ = sub_chain(pts0, n0)
    pts = [jax.device_put(p) for p in pts]
    print('level sizes:', [int(v) for v in ns], flush=True)

    total = 0.0
    total += timed('subsample chain (4 levels)',
                   lambda p, n: sub_chain(p, n)[2], pts0, n0)

    r = r0
    tables = []
    for l in range(num_layers):
        seeds = []
        if plan[l]:
            seeds.append(pts[l + 1])
        if l >= 1:
            seeds.append(pts[l - 1])
        seed_arr = jnp.concatenate(seeds, axis=0) if seeds else None
        cell_cap = max(int(caps[l] * args.cell_ratio) // 256 * 256, 256)
        rad = r

        def tb(p, n, s, _rad=rad, _cc=cell_cap):
            t = build_cell_table(p, n, _rad, cell_cap=_cc,
                                 cand_cap=args.cand_cap, seeds=s)
            return (jnp.sum(t.cand_pos % 97) + jnp.sum(t.cand_ord % 97)
                    + jnp.sum(jnp.where(jnp.isfinite(t.cand_flat),
                                        t.cand_flat, 0.0)))

        total += timed(f'table build L{l}', tb, pts[l], ns[l], seed_arr)
        # build once for the search timings
        tables.append(build_cell_table(
            pts[l], ns[l], rad, cell_cap=cell_cap,
            cand_cap=args.cand_cap, seeds=seed_arr))

        k_l = limits[l] if l < len(limits) else limits[-1]

        def search(t, q, n, _rad=rad, _k=k_l, _rel=host_geom):
            idx, rel, _ = radius_search(t, q, n, _rad, _k, with_rel=_rel)
            s = jnp.sum(idx % 97)
            if rel is not None:
                s += jnp.sum(rel.astype(jnp.int32) % 97)
            return s

        total += timed(f'conv search L{l} ({caps[l]}q, K={k_l})',
                       search, tables[l], pts[l], ns[l])
        if plan[l]:
            total += timed(f'pool search L{l} ({caps[l+1]}q, K={k_l})',
                           search, tables[l], pts[l + 1], ns[l + 1])
        if l >= 1:
            def search_up(t, q, n, _rad=rad,
                          _rel=host_geom and cfg.upsample_k > 1):
                idx, rel, _ = radius_search(t, q, n, _rad, cfg.upsample_k,
                                            with_rel=_rel)
                s = jnp.sum(idx % 97)
                if rel is not None:
                    s += jnp.sum(rel.astype(jnp.int32) % 97)
                return s

            total += timed(
                f'upsample search L{l} ({caps[l-1]}q, K={cfg.upsample_k})',
                search_up, tables[l], pts[l - 1], ns[l - 1])
        r *= 2.0

    print(f'{"SUM of isolated stages":36s} {total:8.2f} ms', flush=True)

    def full(p, n):
        pyr, ok = build_pyramid_device(p, n, cfg, cell_ratio=args.cell_ratio, cand_cap=args.cand_cap)
        s = jnp.float32(0)
        for a in jax.tree.leaves(pyr):
            if a.dtype in (jnp.int32, jnp.int16, jnp.bool_):
                s += jnp.sum(a.astype(jnp.int32) % 97)
            else:
                s += jnp.sum(jnp.where(jnp.isfinite(a), a, 0.0))
        return s + jnp.all(ok)

    timed('FULL build_pyramid_device', full, pts0, n0)


if __name__ == '__main__':
    main()
