"""Inference runtime: dense descriptor extraction + reference-layout dumps.

Replaces the reference `ModelTester` (`utils/tester.py:135-360`):
  * `DescriptorExtractor` — jitted forward over *bucketed* static shapes
    (one XLA program per size bucket; buckets are powers of two so a whole
    test set compiles a handful of programs);
  * `generate_descriptors` — writes the exact output layout of
    `utils/tester.py:177-233` so the reference's offline evaluation
    (`geometric_registration/`, `repeatability/`, MATLAB recall) runs
    unchanged: per fragment, all points sorted by detection score
    ascending, saved as
      {out_root}/D3Feat_{experiment}/descriptors/{scene}/cloud_bin_N.D3Feat.npy
      {out_root}/D3Feat_{experiment}/keypoints/{scene}/cloud_bin_N.npy
      {out_root}/D3Feat_{experiment}/scores/{scene}/cloud_bin_N.npy
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterable, Optional, Tuple

import jax
import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.data.batching import make_test_batch
from d3feat_tpu.models.kpfcnn import KPFCNN


def _bucket(n: int, multiple: int) -> int:
    """Smallest multiple*2^k capacity >= n: a whole test set compiles only
    a handful of XLA programs."""
    cap = multiple
    while cap < n:
        cap *= 2
    return cap


class DescriptorExtractor:
    """Dense per-point descriptors + detection scores for single fragments.

    With ``device_pyramid=True`` the multiscale pyramid itself is built on
    the accelerator (`data/pyramid_device.py`): the host ships one padded
    point array per fragment and gets descriptors back — no host geometry
    in the loop (the host build costs ~1.2 s per 100k fragment on one CPU
    core).  Static-capacity overflows are detected on device and retried
    with grown caps; anything still overflowing falls back to the host
    builder, so results never silently degrade.
    """

    # Independent escalation ladders for the device pyramid's two static
    # capacities.  Rung 0 covers measured post-voxel 3DMatch-like
    # fragments (occupied cells <=0.153 of points, candidates/cell
    # <=224 across the demo pair + the synthetic eval corpus); the
    # per-axis overflow flags from build_pyramid_device grow only the
    # knob that overflowed, and the successful rung is remembered per
    # point bucket so later same-shaped fragments skip the failed runs.
    _CELL_RATIOS = (0.22, 0.45, 1.2)
    _CAND_CAPS = (240, 352, 512)

    def __init__(self, config: Config, variables: Dict,
                 timer: Optional[list] = None,
                 device_pyramid: bool = False,
                 batch_program: bool = False):
        self.config = config
        self.variables = variables
        self._fns: Dict[int, callable] = {}
        self._rung: Dict[int, Tuple[int, int]] = {}  # bucket -> rung pair
        self.timer = timer if timer is not None else []
        self.device_pyramid = device_pyramid
        # batch_program=True: extract_many chunks run as ONE B-cloud XLA
        # program (vmapped device pyramid + forward) instead of B
        # pipelined single-cloud dispatches.  The vmapped pyramid is
        # bit-identical to the single-cloud build (measured on TPU;
        # tests/test_device_grid.py::test_batch_pyramid_matches_single),
        # but the vmapped bf16 forward re-tiles its MXU contractions, so
        # descriptors differ from per-fragment extract() at the
        # documented cross-program ulp class (VALIDATION.md one-path
        # rule).  Default OFF: the pipelined path stays bit-identical to
        # extract().
        self.batch_program = batch_program
        # (cap, B) combos whose one-dispatch B-cloud program failed to
        # compile (HBM) — remembered so later chunks skip the attempt
        self._no_batch: Dict[Tuple[int, int], bool] = {}

    def _forward_for(self, cap: int):
        if cap not in self._fns:
            cfg = self.config.replace(max_points=cap)
            model = KPFCNN(cfg)

            @jax.jit
            def fwd(variables, pyramid):
                return model.apply(variables, pyramid, training=False)

            self._fns[cap] = (cfg, fwd)
        return self._fns[cap]

    def _forward_for_safe(self, cap: int):
        key = -cap  # separate cache slot for the wide-bucket program
        if key not in self._fns:
            # ratio 1.0: every level padded to the level-0 capacity —
            # slow but cannot overflow (subsampling never adds points)
            cfg = self.config.replace(max_points=cap,
                                      level_capacity_ratios=(),
                                      level_capacity_ratio=1.0)
            model = KPFCNN(cfg)

            @jax.jit
            def fwd(variables, pyramid):
                return model.apply(variables, pyramid, training=False)

            self._fns[key] = (cfg, fwd)
        return self._fns[key]

    def _device_fn(self, cap: int, grow: Tuple[int, int]):
        key = ('dev', cap, grow)
        if key not in self._fns:
            from d3feat_tpu.data.pyramid_device import build_pyramid_device
            cell_ratio = self._CELL_RATIOS[grow[0]]
            cand_cap = self._CAND_CAPS[grow[1]]
            cfg = self.config.replace(max_points=cap)
            model = KPFCNN(cfg)

            @jax.jit
            def fwd(variables, pts, n):
                pyramid, ok = build_pyramid_device(
                    pts, n, cfg, cell_ratio=cell_ratio, cand_cap=cand_cap)
                desc, score = model.apply(variables, pyramid,
                                          training=False)
                return desc, score, ok

            self._fns[key] = fwd
        return self._fns[key]

    def _device_fn_batch(self, cap: int, b: int, grow: Tuple[int, int]):
        key = ('devb', cap, b, grow)
        if key not in self._fns:
            from d3feat_tpu.data.pyramid_device import (
                build_pyramid_device_batch)
            cell_ratio = self._CELL_RATIOS[grow[0]]
            cand_cap = self._CAND_CAPS[grow[1]]
            cfg = self.config.replace(max_points=cap)
            model = KPFCNN(cfg)

            @jax.jit
            def fwd(variables, pts, n):           # [B, cap, 3], [B]
                pyramids, ok = build_pyramid_device_batch(
                    pts, n, cfg, cell_ratio=cell_ratio, cand_cap=cand_cap)
                desc, score = jax.vmap(
                    lambda pyr: model.apply(variables, pyr,
                                            training=False))(pyramids)
                return desc, score, ok            # [B,cap,32],[B,cap,1],[B,3]

            self._fns[key] = fwd
        return self._fns[key]

    def _extract_device(self, points: np.ndarray
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        n = len(points)
        cap = _bucket(n, self.config.size_multiple)
        padded = np.full((cap, 3), 1e6, np.float32)
        padded[:n] = points
        i_cell, i_cand = self._rung.get(cap, (0, 0))
        while True:
            fwd = self._device_fn(cap, (i_cell, i_cand))
            t0 = time.perf_counter()
            desc, score, ok = fwd(self.variables, padded, np.int32(n))
            ok_hard, ok_cells, ok_cand = (bool(x) for x in
                                          jax.device_get(ok))
            if ok_hard and ok_cells and ok_cand:
                desc = np.asarray(jax.device_get(desc))[:n]
                score = np.asarray(jax.device_get(score))[:n, 0]
                self.timer.append(time.perf_counter() - t0)
                # remember the winning rung: later same-bucket fragments
                # start here instead of re-failing the smaller programs
                self._rung[cap] = (i_cell, i_cand)
                return desc, score
            if not ok_hard:
                return None               # grid/level capacity: host build
            grew = False
            if not ok_cells and i_cell + 1 < len(self._CELL_RATIOS):
                i_cell += 1
                grew = True
            if not ok_cand and i_cand + 1 < len(self._CAND_CAPS):
                i_cand += 1
                grew = True
            if not grew:
                return None               # ladder exhausted: host build

    def _forward_multi(self, cap: int, b: int):
        key = ('multi', cap, b)
        if key not in self._fns:
            cfg = self.config.replace(max_points=cap * b)
            model = KPFCNN(cfg)

            @jax.jit
            def fwd(variables, pyramid):
                return model.apply(variables, pyramid, training=False)

            self._fns[key] = (cfg, fwd)
        return self._fns[key]

    def extract_many(self, points_list, batch: int = 4):
        """Batched dense extraction: groups same-bucket fragments and runs
        `batch` of them per XLA dispatch (host-pyramid path: one B-cloud
        program via `make_test_batch_multi`; device-pyramid path: B
        pipelined dispatches with the results stacked on device and
        fetched once).  On tunneled TPUs the per-fragment wall time is
        dominated by dispatch+fetch round trips (~8 s vs ~150 ms of
        compute at 100k points), so batching B fragments cuts eval-dump
        wall clock ~Bx.  Returns [(desc, score)] aligned with the input
        order; numerically identical to per-fragment `extract` in f32
        (each cloud is an independent segment end-to-end).
        """
        out = [None] * len(points_list)
        if batch <= 1:
            return [self.extract(p) for p in points_list]
        groups: Dict[int, list] = {}
        for i, p in enumerate(points_list):
            groups.setdefault(
                _bucket(len(p), self.config.size_multiple), []).append(i)
        for cap, idxs in groups.items():
            for c0 in range(0, len(idxs), batch):
                chunk = idxs[c0:c0 + batch]
                if self.device_pyramid:
                    self._extract_chunk_device(points_list, chunk, cap,
                                               out, batch)
                else:
                    self._extract_chunk_host(points_list, chunk, cap,
                                             batch, out)
        return out

    def _extract_chunk_host(self, points_list, chunk, cap, batch, out):
        """One B-cloud dispatch on the host-pyramid path.  Short tail
        chunks are padded by repeating the last fragment (static shapes:
        one compile per (cap, B), not per remainder)."""
        from d3feat_tpu.data.batching import make_test_batch_multi
        pts = [points_list[i] for i in chunk]
        while len(pts) < batch:
            pts.append(pts[-1])
        cfg, fwd = self._forward_multi(cap, batch)
        try:
            b = make_test_batch_multi(pts, cfg)
        except ValueError:
            # coarse-level overflow in the tight-ratio program: fall back
            # to per-fragment extraction (which has its own safe retry)
            for i in chunk:
                out[i] = self.extract(points_list[i])
            return
        t0 = time.perf_counter()
        desc, score = fwd(self.variables, b['pyramid'])
        desc = np.asarray(jax.device_get(desc))
        score = np.asarray(jax.device_get(score))
        self.timer.append(time.perf_counter() - t0)
        off = 0
        for j, i in enumerate(chunk):
            n = len(points_list[i])
            out[i] = (desc[off:off + n], score[off:off + n, 0])
            off += len(pts[j])

    def _extract_chunk_device(self, points_list, chunk, cap, out,
                              batch=None):
        """Device-pyramid path: ONE B-cloud program (vmapped pyramid +
        forward, `build_pyramid_device_batch`) per chunk — a single
        dispatch + fetch instead of B pipelined ones.  Falls back to the
        pipelined single-cloud path when the B-cloud program cannot
        compile at this bucket (HBM), and to the per-fragment retry
        ladder for clouds whose static capacities overflow.  Tail chunks
        are padded by repeating the last fragment so one (cap, B)
        program serves every chunk of the group."""
        b = batch or len(chunk)
        if self.batch_program and b > 1 and (cap, b) not in self._no_batch:
            filled = list(chunk) + [chunk[-1]] * (b - len(chunk))
            stacked = np.full((b, cap, 3), 1e6, np.float32)
            ns = np.zeros((b,), np.int32)
            for j, i in enumerate(filled):
                pts = points_list[i]
                stacked[j, :len(pts)] = pts
                ns[j] = len(pts)
            fwd = self._device_fn_batch(cap, b,
                                        self._rung.get(cap, (0, 0)))
            t0 = time.perf_counter()
            try:
                desc, score, ok = fwd(self.variables, stacked, ns)
                oks = np.asarray(jax.device_get(ok))
                descs = np.asarray(jax.device_get(desc))
                scores = np.asarray(jax.device_get(score))
            except Exception as e:  # noqa: BLE001 — remote compile OOM
                print(f'B-cloud device program (cap={cap}, B={b}) '
                      f'unavailable ({type(e).__name__}); falling back '
                      f'to pipelined dispatches', flush=True)
                self._no_batch[(cap, b)] = True
            else:
                self.timer.append(time.perf_counter() - t0)
                for j, i in enumerate(chunk):
                    n = len(points_list[i])
                    if oks[j].all():
                        out[i] = (descs[j, :n], scores[j, :n, 0])
                    else:
                        # static-capacity overflow: per-fragment ladder
                        out[i] = self.extract(points_list[i])
                return
        self._extract_chunk_device_pipelined(points_list, chunk, cap, out)

    def _extract_chunk_device_pipelined(self, points_list, chunk, cap,
                                        out):
        """Fallback: pipeline the chunk's single-cloud dispatches
        (async), stack results on device, fetch once — the per-fragment
        fetch round trips collapse into three per chunk."""
        import jax.numpy as jnp
        fwd = self._device_fn(cap, self._rung.get(cap, (0, 0)))
        handles = []
        t0 = time.perf_counter()
        for i in chunk:
            pts = points_list[i]
            padded = np.full((cap, 3), 1e6, np.float32)
            padded[:len(pts)] = pts
            handles.append(fwd(self.variables, padded, np.int32(len(pts))))
        oks = np.asarray(jax.device_get(jnp.stack([h[2] for h in handles])))
        descs = np.asarray(jax.device_get(jnp.stack(
            [h[0] for h in handles])))
        scores = np.asarray(jax.device_get(jnp.stack(
            [h[1] for h in handles])))
        self.timer.append(time.perf_counter() - t0)
        for j, i in enumerate(chunk):
            n = len(points_list[i])
            if oks[j].all():
                out[i] = (descs[j, :n], scores[j, :n, 0])
            else:
                # rare static-capacity overflow: per-fragment retry ladder
                out[i] = self.extract(points_list[i])

    def extract(self, points: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
        """points [N,3] -> (descriptors [N,32], scores [N])."""
        if self.device_pyramid:
            out = self._extract_device(points)
            if out is not None:
                return out
        n = len(points)
        cap = _bucket(n, self.config.size_multiple)
        cfg, fwd = self._forward_for(cap)
        try:
            batch = make_test_batch(points, cfg)
        except ValueError:
            # coarse level overflowed the tight capacity ratios (unusual
            # geometry); retry in a safe wide-bucket program
            cfg, fwd = self._forward_for_safe(cap)
            batch = make_test_batch(points, cfg)
        t0 = time.perf_counter()
        desc, score = fwd(self.variables, batch['pyramid'])
        desc = np.asarray(jax.device_get(desc))[:n]
        score = np.asarray(jax.device_get(score))[:n, 0]
        self.timer.append(time.perf_counter() - t0)
        return desc, score


def _experiment_dirs(out_root: str, experiment: str) -> Tuple[str, Dict]:
    base = os.path.join(out_root, f'D3Feat_{experiment}')
    dirs = {k: os.path.join(base, k)
            for k in ('descriptors', 'keypoints', 'scores')}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    return base, dirs


def path_signature(config: Config, pyramid: str,
                   batch_program: bool = False) -> Dict:
    """The numeric identity of a dump: which pyramid builder produced the
    geometry and which dtypes ran the forward.  Dumps with different
    signatures are NOT comparable pair-for-pair at the 250-keypoint cut:
    even all-f32 forwards differ across pyramid paths in low bits (host
    barycenters accumulate in f64, the device pyramid in f32; the two
    paths also compile different XLA programs), and the reference det
    head's beta pole (`models/D3Feat.py:84-90`) can amplify that ulp
    noise by ~1e8 on degenerate rows — measured in RESULTS.md round 4.
    `batch_program` is part of the identity for the same reason: the
    vmapped B-cloud forward re-tiles its MXU contractions (round 5,
    VALIDATION.md)."""
    return {'pyramid': pyramid,
            'compute_dtype': config.compute_dtype,
            'score_dtype': getattr(config, 'score_dtype',
                                   config.compute_dtype),
            'batch_program': batch_program}


def write_dump_meta(base: str, signature: Dict) -> None:
    import json
    with open(os.path.join(base, 'dump_meta.json'), 'w') as fh:
        json.dump(signature, fh)


def read_dump_meta(base: str) -> Optional[Dict]:
    import json
    p = os.path.join(base, 'dump_meta.json')
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def dump_fragment(dirs: Dict, scene: str, frag_id: int,
                  points: np.ndarray, desc: np.ndarray,
                  score: np.ndarray) -> None:
    """Write one fragment in the reference tester's exact layout: all
    points sorted by detection score ascending (utils/tester.py:208-212)
    — consumers take the LAST k entries as the top-k keypoints."""
    order = np.argsort(score)
    for k in dirs.values():
        os.makedirs(os.path.join(k, scene), exist_ok=True)
    np.save(os.path.join(dirs['descriptors'], scene,
                         f'cloud_bin_{frag_id}.D3Feat.npy'),
            desc[order].astype(np.float32))
    np.save(os.path.join(dirs['keypoints'], scene,
                         f'cloud_bin_{frag_id}.npy'),
            points[order].astype(np.float32))
    np.save(os.path.join(dirs['scores'], scene,
                         f'cloud_bin_{frag_id}.npy'),
            score[order].astype(np.float32))


def generate_descriptors(
    extractor: DescriptorExtractor,
    fragments: Iterable[Tuple[str, int, np.ndarray]],
    out_root: str,
    experiment: str,
    batch_frags: int = 1,
) -> str:
    """Run dense extraction over (scene, frag_id, points) fragments and dump
    the reference layout. Returns the experiment directory.

    ``batch_frags`` > 1 extracts that many same-bucket fragments per XLA
    dispatch (`DescriptorExtractor.extract_many`) — same numbers, ~Bx less
    tunnel round-trip wall clock."""
    base, dirs = _experiment_dirs(out_root, experiment)
    write_dump_meta(base, path_signature(
        extractor.config,
        'device' if extractor.device_pyramid else 'host',
        batch_program=extractor.batch_program and batch_frags > 1))
    if batch_frags > 1:
        frags = list(fragments)
        results = extractor.extract_many([f[2] for f in frags],
                                         batch=batch_frags)
        for (scene, frag_id, points), (desc, score) in zip(frags, results):
            dump_fragment(dirs, scene, frag_id, points, desc, score)
    else:
        for scene, frag_id, points in fragments:
            desc, score = extractor.extract(points)
            dump_fragment(dirs, scene, frag_id, points, desc, score)
    if extractor.timer:
        print(f'Average feature extraction time: '
              f'{np.mean(extractor.timer):.3f} s')
    return base
