"""On-device geometry: grid-hash radius search + voxel subsampling in XLA.

TPU-native replacement for the *host* pyramid build on the inference path.
The reference builds its pyramid on CPU inside tf.data map functions
(`datasets/common.py:1325-1397`) with nanoflann KD-trees
(`tf_custom_ops/tf_neighbors/neighbors/neighbors.cpp:211-332`); our host
port (`ops/neighbors.py`, `native/src/geometry.cpp`) costs ~1.2 s per 100k
fragment on one CPU core while the network forward is ~49 ms on the TPU —
dense extraction is host-bound.  This module moves the search onto the
chip with the same semantics so a raw cloud can go straight to
descriptors without any host geometry.

Design (everything shape-static, jit-compatible):

  * **Grid hash, no tree.**  Cell size == search radius; the 27 cells
    around a query's cell cover every possible in-radius neighbor.  Cell
    keys pack (cx, cy, cz) relative to the cloud min corner into one int32
    (10 bits/axis -> grids up to 1024^3 cells; larger extents overflow and
    are reported, see below).  Keys are z-minor, so the 27-cell probe is
    9 *contiguous* key ranges — the same layout trick as the native host
    search v2 (`native/src/geometry.cpp`).
  * **Sort-and-searchsorted layout.**  Supports are sorted by cell key
    (`argsort`); any cell run is found with two `searchsorted` calls.
  * **Compacted per-cell candidate table.**  All queries in one cell share
    one candidate set (their 27 surrounding cells).  For each *occupied*
    cell the 9 z-runs are packed head-to-tail (exclusive cumsum of run
    lengths) into a fixed `cand_cap`-wide row, so table slots track the
    *actual* candidate count (~27 * mean-occupancy) instead of
    27 * max-cell-occupancy.  This matters because XLA row-gather runs at
    a fixed ~250M rows/s (PERF_NOTES.md): the table gather is the
    dominant cost of the whole search, and compaction cuts its row count
    ~3x.  Queries then expand their cell's table row with one wide-row
    gather (cheap: few rows, many bytes).
  * **Distance + K-nearest on device.**  Squared distances use the exact
    elementwise form `sum((s - q)^2)` (not the |q|^2-2qs matmul) to keep
    f32 rounding aligned with the host implementation; selection is one
    payload-carrying variadic `lax.sort` by (d2, original index) — the
    same ascending tie order as the host's packed (d2_bits << 32 | index)
    keys and the reference's distance sort (`neighbors.cpp:319-325`).
    `d2 <= r2` inclusive, matching `native/src/geometry.cpp:206`.
  * **Static caps + overflow flags.**  Occupied-cell count and per-cell
    candidate count get static capacities (calibrated like the level
    capacities elsewhere in this repo).  Any overflow is *detected on
    device* and returned as a boolean so the caller can retry with bigger
    caps — the same contract as `runtime.tester`'s bucketed retry.
  * **One table serves three searches.**  Within a pyramid level l, conv
    (queries = points_l), pool (queries = points_{l+1}) and the upsample
    *into* level l from l+1 (radius 2*r_l == r_{l+1}, i.e. level l+1's
    table) all probe the same support set at the same radius, so each
    level builds exactly one grid index + one candidate table
    (`data/pyramid_device.py`).

Semantics parity (golden-tested in tests/test_device_grid.py):
  * K nearest supports within `radius`, ascending by distance; ragged rows
    padded with shadow index == the support *capacity* (the pyramid
    convention of `data/pyramid.py`, where the shadow row is appended at
    the capacity, not the dynamic count).
  * Optional relative vectors (support - query) quantized to int16 by
    radius/32767, shadow slots 32767 (`ops/neighbors.py:108-155`).
  * Voxel subsampling emits the barycenter of every occupied `dl` cell
    (`cpp_wrappers/.../grid_subsampling.cpp:5-97`); cell order is
    key-sorted (the reference's unordered_map order is nondeterministic,
    so any self-consistent order is equivalent — documented in SURVEY §2,
    N2).  Barycenters accumulate in f32 on device (host uses f64); the
    difference is ~1e-6 m at 3DMatch scales.

Single-cloud only (B == 1): this path serves dense test-time extraction,
which the reference also runs one fragment at a time
(`utils/tester.py:177-233`).  Training keeps the host/cached pipeline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PAD_POS = 1e6
_BITS = 10                      # cells per axis = 2^_BITS
_GRID = 1 << _BITS
_KEY_INVALID = np.int32(1 << (3 * _BITS))   # sorts after every real key


class CellTable(NamedTuple):
    """Grid-sorted supports plus a compacted candidate table per occupied
    cell.  `radius` is both the cell edge and the max supported search
    radius."""
    sorted_xyz: jnp.ndarray     # [M, 3] f32, pads at 1e6 sort last
    order: jnp.ndarray          # [M] int32: sorted slot -> original index
    origin: jnp.ndarray         # [3] f32 min corner of valid points
    inv_cell: jnp.ndarray       # scalar f32, 1 / radius
    ckey: jnp.ndarray           # [C_cap] int32 keys of occupied cells,
                                #   ascending, pads = _KEY_INVALID
    cand_pos: jnp.ndarray       # [C_cap, cand_cap] sorted-support positions
    cand_ord: jnp.ndarray       # [C_cap, cand_cap] their ORIGINAL indices
                                #   (invalid slots = len(sorted_xyz))
    cand_flat: jnp.ndarray      # [C_cap, 3*cand_cap] their coordinates,
                                #   coordinate-BLOCKED (x block | y block |
                                #   z block).  A [C, cap, 3] field tile-
                                #   pads its minor dim 3 -> 128 lanes
                                #   (42.7x HBM: 20.6 GB at the widest
                                #   retry rung, the round-3 OOM); the
                                #   flat layout stores exactly the
                                #   logical bytes and the search slices
                                #   per-coordinate [C, cap] views
    cand_valid: jnp.ndarray     # [C_cap, cand_cap] bool
    ok_grid: jnp.ndarray        # scalar bool: every valid point fit the
                                #   1024^3 cell grid (not growable by the
                                #   cap ladder -> host fallback)
    ok_cells: jnp.ndarray       # scalar bool: occupied cells <= cell_cap
    ok_cand: jnp.ndarray        # scalar bool: candidates/cell <= cand_cap


def _cell_coords(points: jnp.ndarray, origin: jnp.ndarray,
                 inv_cell: jnp.ndarray) -> jnp.ndarray:
    # (p - origin) * (1/cell): same f32 form as native/src/geometry.cpp:117
    return jnp.floor((points - origin) * inv_cell).astype(jnp.int32)


def _pack(cc: jnp.ndarray) -> jnp.ndarray:
    return (cc[..., 0] << (2 * _BITS)) | (cc[..., 1] << _BITS) | cc[..., 2]


def _masked_origin(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    big = jnp.where(valid[:, None], points, jnp.inf)
    origin = jnp.min(big, axis=0)
    return jnp.where(jnp.isfinite(origin), origin, 0.0)


def build_cell_table(
    points: jnp.ndarray,
    n_valid: jnp.ndarray,
    radius: float,
    *,
    cell_cap: int,
    cand_cap: int,
    seeds: Optional[jnp.ndarray] = None,
    n_seeds: Optional[jnp.ndarray] = None,
) -> CellTable:
    """Index `points[:n_valid]` (pads at 1e6 beyond) for radius search.

    Args:
      points: [M, 3] f32 stacked supports, padded at 1e6.
      n_valid: dynamic valid count.
      radius: search radius == cell size (static).
      cell_cap: max occupied cells (static; overflow -> ok=False).
      cand_cap: max candidates (supports in the surrounding 27 cells) per
        cell (static; overflow -> ok=False).
      seeds: optional [E, 3] future *query* points whose cells must get
        table rows even if no support lands in them (pool/upsample queries
        live on a differently-anchored grid, so their cells can be empty
        of supports while adjacent cells are not).
      n_seeds: dynamic valid seed count; None means "valid = coordinate
        below the 1e6 pad" (lets callers concatenate padded arrays).
    """
    m = points.shape[0]
    valid = jnp.arange(m) < n_valid
    origin = _masked_origin(points, valid)
    if seeds is not None:
        # the grid must also cover future queries (e.g. fine points lie
        # below the min corner of the coarse barycenters they query)
        if n_seeds is None:
            sv = jnp.all(jnp.abs(seeds) < _PAD_POS * 0.5, axis=-1)
        else:
            sv = jnp.arange(seeds.shape[0]) < n_seeds
        origin = jnp.minimum(origin, _masked_origin(seeds, sv))
    inv_cell = jnp.float32(1.0) / jnp.float32(radius)
    cc = _cell_coords(points, origin, inv_cell)
    in_grid = jnp.all((cc >= 0) & (cc < _GRID), axis=-1)
    ok_grid = jnp.all(~valid | in_grid)
    key = jnp.where(valid & in_grid, _pack(jnp.clip(cc, 0, _GRID - 1)),
                    _KEY_INVALID)
    order = jnp.argsort(key).astype(jnp.int32)
    skey = key[order]
    sxyz = points[order]

    # table cells = unique cells of supports (+ seed queries)
    if seeds is None:
        allkey = skey                                        # already sorted
    else:
        svalid = sv
        scc = _cell_coords(seeds, origin, inv_cell)
        s_in = jnp.all((scc >= 0) & (scc < _GRID), axis=-1)
        # out-of-grid seeds are NOT an overflow here: the search reports
        # them itself (their queries get q_in False).
        ekey = jnp.where(svalid & s_in, _pack(jnp.clip(scc, 0, _GRID - 1)),
                         _KEY_INVALID)
        allkey = jnp.sort(jnp.concatenate([skey, ekey]))
    v = allkey != _KEY_INVALID
    first = jnp.concatenate([v[:1], v[1:] & (allkey[1:] != allkey[:-1])])
    cid = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_cells = jnp.max(jnp.where(v, cid + 1, 0))
    ok_cells = n_cells <= cell_cap
    ckey = jnp.full((cell_cap,), _KEY_INVALID, jnp.int32)
    ckey = ckey.at[jnp.where(v & first, cid, cell_cap)].set(
        allkey, mode='drop')

    # 9 (dx, dy) probes per occupied cell, each a contiguous z-run
    cx = ckey >> (2 * _BITS)
    cy = (ckey >> _BITS) & (_GRID - 1)
    cz = ckey & (_GRID - 1)
    dx, dy = jnp.meshgrid(jnp.arange(-1, 2), jnp.arange(-1, 2),
                          indexing='ij')
    px = cx[:, None] + dx.ravel()[None, :]                   # [C, 9]
    py = cy[:, None] + dy.ravel()[None, :]
    p_in = ((px >= 0) & (px < _GRID) & (py >= 0) & (py < _GRID)
            & (ckey != _KEY_INVALID)[:, None])
    zlo = jnp.maximum(cz - 1, 0)[:, None]
    zhi = jnp.minimum(cz + 1, _GRID - 1)[:, None]
    base = (px << (2 * _BITS)) | (py << _BITS)
    lo = jnp.where(p_in, base | zlo, 0)
    hi = jnp.where(p_in, base | zhi, -1)
    # method='sort': the default scan-based binary search is a 17-round
    # lax.scan (~108 ms for these shapes on TPU); the sort-based merge is
    # ~8 ms (measured, PERF_NOTES.md).  One merged call for both probe
    # sets (right == left of key+1 for int keys) instead of two: the
    # merge sorts the table once, not twice.
    se = jnp.searchsorted(skey, jnp.concatenate([lo, hi + 1], axis=1),
                          side='left', method='sort')
    start, end = se[:, :9], se[:, 9:]
    run = jnp.maximum(end - start, 0)                        # [C, 9]

    # compact the 9 runs head-to-tail into cand_cap slots
    off = jnp.cumsum(run, axis=1) - run                      # exclusive
    total = off[:, -1] + run[:, -1]
    ok_cand = jnp.max(total) <= cand_cap
    t = jnp.arange(cand_cap)
    # probe index covering slot t: rightmost probe with off <= t.  A
    # broadcast comparison-sum, NOT a vmapped searchsorted — vmapping
    # searchsorted over the 9-element rows lowers to per-element dynamic
    # gathers and measured ~1 s at 100k points on TPU; this form is pure
    # VPU elementwise+reduce (~ms).
    probe = jnp.sum(off[:, :, None] <= t[None, None, :],
                    axis=1).astype(jnp.int32) - 1            # [C, cand_cap]
    probe = jnp.clip(probe, 0, 8)
    # pos[c,t] = start[c,probe] + t - off[c,probe] = shift[c,probe] + t.
    # Select shift with 9 broadcast wheres: two take_along_axis gathers
    # here measured +120 ms at 100k points (element-gather issue rate);
    # the monotone-probe select is pure VPU.
    shift = start - off                                      # [C, 9]
    sel_shift = jnp.broadcast_to(shift[:, 0:1], probe.shape)
    for o in range(1, 9):
        sel_shift = jnp.where(probe >= o, shift[:, o:o + 1], sel_shift)
    pos = sel_shift + t[None, :]
    cand_valid = t[None, :] < jnp.minimum(total, cand_cap)[:, None]
    pos = jnp.clip(pos, 0, m - 1)
    # candidate coordinates, coordinate-blocked flat [C, 3*cap] (see the
    # CellTable field doc), plus the ORIGINAL index riding the same row
    # as a 4th f32 lane: the table materialization is gather-rate bound
    # (~250M rows/s), and a separate order[pos] element gather was a
    # second full pass at the same rate — one [M, 4]-row gather does
    # both (measured: L0 table build 86 -> 22 ms @ 100k).  The index
    # lane is a VALUE cast, NOT a bitcast: int32 bit patterns below
    # ~2^23 are f32 DENORMALS, and TPU data paths flush denormals to
    # zero (measured: every cand_ord became 0 on TPU while the CPU
    # golden tests stayed green).  Indices < 2^24 are exact in f32, and
    # capacities here are far below that.  The [cc, cap, 4] row-gather
    # result exists only per lax.map chunk, so its lane-padded form
    # stays transient; invalid slots get a far-away coordinate so d2
    # can never pass.
    if m >= (1 << 24):   # static trace-time check; assert would vanish
        raise ValueError(  # under python -O and silently corrupt indices
            f'support capacity {m} >= 2^24: the index lane rides an f32 '
            f'gather lane as a VALUE cast, exact only below 2^24')
    sxyzo = jnp.concatenate(
        [sxyz, order.astype(jnp.float32)[:, None]], axis=1)

    def _flat_chunk(args):
        p, v = args
        g = sxyzo[p]                                 # [cc, cap, 4]
        xyz = jnp.where(v[..., None], g[..., :3], 2 * _PAD_POS)
        flat = jnp.concatenate([xyz[..., 0], xyz[..., 1], xyz[..., 2]],
                               axis=1)
        o = g[..., 3].astype(jnp.int32)
        return flat, jnp.where(v, o, m)

    c_chunk = 2048
    c_cap = pos.shape[0]
    if c_cap > c_chunk:
        c_pad = -(-c_cap // c_chunk) * c_chunk
        pos_p = jnp.pad(pos, ((0, c_pad - c_cap), (0, 0)))
        val_p = jnp.pad(cand_valid, ((0, c_pad - c_cap), (0, 0)))
        cand_flat, cand_ord = jax.lax.map(
            _flat_chunk, (pos_p.reshape(-1, c_chunk, cand_cap),
                          val_p.reshape(-1, c_chunk, cand_cap)))
        cand_flat = cand_flat.reshape(c_pad, 3 * cand_cap)[:c_cap]
        cand_ord = cand_ord.reshape(c_pad, cand_cap)[:c_cap]
    else:
        cand_flat, cand_ord = _flat_chunk((pos, cand_valid))
    # original indices resolved at BUILD time (cells << queries): the
    # search sorts by (d2, original index) exactly like the host's packed
    # (d2_bits << 32 | index) keys, and needs no order[] gather of its own
    return CellTable(sxyz, order, origin, inv_cell, ckey,
                     pos.astype(jnp.int32), cand_ord.astype(jnp.int32),
                     cand_flat, cand_valid, ok_grid, ok_cells, ok_cand)


def radius_search(
    table: CellTable,
    queries: jnp.ndarray,
    n_q: jnp.ndarray,
    radius: float,
    max_neighbors: int,
    *,
    with_rel: bool = False,
    chunk: int = 16384,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
    """Fixed-degree radius search against a prebuilt :class:`CellTable`.

    `radius` must equal the table's cell size (the candidate sets only
    cover that ball).  Queries in cells with no support (or out of grid)
    get all-shadow rows; shadow index == len(table.sorted_xyz) (support
    capacity).  Rows beyond `n_q` are all-shadow.

    Returns (idx [Nq, K] int32, rel int16 [Nq, K, 3] | None,
    ok [3] bool = (grid ok incl. queries, cells ok, cand ok) — per-axis so
    the caller's retry ladder grows only the knob that overflowed).
    """
    nq_cap = queries.shape[0]
    ms = table.sorted_xyz.shape[0]
    shadow = ms
    cand_cap = table.cand_pos.shape[1]
    if max_neighbors > cand_cap:
        raise ValueError(f'max_neighbors {max_neighbors} exceeds the '
                         f'table cand_cap {cand_cap}')
    r2 = jnp.float32(radius) ** 2
    qvalid = jnp.arange(nq_cap) < n_q

    qcc = _cell_coords(queries, table.origin, table.inv_cell)
    q_in = jnp.all((qcc >= 0) & (qcc < _GRID), axis=-1)
    ok = jnp.stack([table.ok_grid & jnp.all(~qvalid | q_in),
                    table.ok_cells, table.ok_cand])
    qkey = jnp.where(qvalid & q_in, _pack(jnp.clip(qcc, 0, _GRID - 1)),
                     _KEY_INVALID)
    rank = jnp.searchsorted(table.ckey, qkey, side='left', method='sort')
    rank = jnp.clip(rank, 0, table.ckey.shape[0] - 1)
    hit_cell = table.ckey[rank] == qkey                      # [Nq]

    def one_chunk(args):
        q_xyz, rk, hc = args
        # coordinate-blocked flat rows: one [c]-row gather, then pure
        # elementwise [c, cap] math — no rank-3 tensor (whose minor-3 dim
        # would tile-pad 42.7x) ever materializes
        flat = table.cand_flat[rk]                           # [c, 3*cap]
        dx = flat[:, :cand_cap] - q_xyz[:, 0:1]
        dy = flat[:, cand_cap:2 * cand_cap] - q_xyz[:, 1:2]
        dz = flat[:, 2 * cand_cap:] - q_xyz[:, 2:3]
        # (x + y) + z: the same f32 association as jnp.sum over a minor-3
        # axis, so d2 stays bit-identical to the host's accumulation
        d2 = dx * dx + dy * dy + dz * dz
        good = (d2 <= r2) & hc[:, None]
        # selection via ONE payload-carrying sort, NOT top_k +
        # take_along_axis (element-gather take_alongs over [N, cand_cap]
        # are the measured killer on TPU; variadic sorts are ~5 ms).
        # Sorting by (d2, original index) reproduces the host's packed
        # (d2_bits << 32 | index) tie order exactly (geometry.cpp; exact
        # equidistance is common: pool queries are 2-point-voxel
        # midpoints).  Rejected slots carry (inf, shadow) so after
        # truncation the row is already ascending with shadow pads last.
        d2m = jnp.where(good, d2, jnp.inf)
        ordm = jnp.where(good, table.cand_ord[rk], shadow)
        if with_rel:
            # quantize the rel vectors from the ALREADY-GATHERED
            # candidate diffs and let the selection carry them, instead
            # of re-gathering sorted_xyz[pos] after the cut ([N*K] rows
            # = 3.6M at L0: ~12 ms; two extra int32 sort operands are
            # far cheaper).  Same bytes minus the same query -> the
            # quantized values are bit-identical to the re-gather form.
            s = 32767.0 / radius
            dxq = jnp.clip(jnp.rint(dx * s), -32767, 32767).astype(
                jnp.int32)
            dyq = jnp.clip(jnp.rint(dy * s), -32767, 32767).astype(
                jnp.int32)
            dzq = jnp.clip(jnp.rint(dz * s), -32767, 32767).astype(
                jnp.int32)
        if max_neighbors == 1:
            # K == 1 (the upsample search): a full cand_cap-wide
            # 3-operand sort for a single nearest neighbor measured
            # 40 ms at 100k queries; two VPU min-reductions produce the
            # identical (d2, original index) winner in ~a tenth of that
            d2min = jnp.min(d2m, axis=1, keepdims=True)
            tie = d2m == d2min                       # inf rows: all True,
            idx = jnp.min(jnp.where(tie, ordm, shadow),  # ordm == shadow
                          axis=1, keepdims=True)
            if with_rel:
                # ord values are unique per support, so exactly one slot
                # matches (tie & ordm == idx); a masked min extracts it
                sel = tie & (ordm == idx)
                rel3 = [jnp.min(jnp.where(sel, dq, 32767), axis=1,
                                keepdims=True) for dq in (dxq, dyq, dzq)]
                rel = jnp.stack(rel3, axis=-1)
        else:
            if with_rel:
                _, idx, rx, ry, rz = jax.lax.sort(
                    (d2m, ordm, dxq, dyq, dzq), num_keys=2)
                k = max_neighbors
                rel = jnp.stack([rx[:, :k], ry[:, :k], rz[:, :k]],
                                axis=-1)
                idx = idx[:, :k]
            else:
                _, idx = jax.lax.sort((d2m, ordm), num_keys=2)
                idx = idx[:, :max_neighbors]
        found = idx < shadow
        if with_rel:
            rel = jnp.where(found[..., None], rel.astype(jnp.int16),
                            np.int16(32767))
        else:
            rel = jnp.zeros((q_xyz.shape[0], max_neighbors, 3), jnp.int16)
        return idx, rel

    if nq_cap % chunk == 0 and nq_cap > chunk:
        qs = queries.reshape(-1, chunk, 3)
        rks = rank.reshape(-1, chunk)
        hcs = hit_cell.reshape(-1, chunk)
        idx, rel = jax.lax.map(one_chunk, (qs, rks, hcs))
        idx = idx.reshape(nq_cap, max_neighbors)
        rel = rel.reshape(nq_cap, max_neighbors, 3)
    else:
        idx, rel = one_chunk((queries, rank, hit_cell))

    idx = jnp.where(qvalid[:, None], idx, shadow)
    if not with_rel:
        return idx, None, ok
    rel = jnp.where(qvalid[:, None, None], rel, np.int16(32767))
    return idx, rel, ok


def grid_subsample_device(
    points: jnp.ndarray,
    n_valid: jnp.ndarray,
    sample_dl: float,
    out_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Voxel-barycenter subsampling on device.

    Returns (sub_points [out_cap, 3] padded at 1e6, n_sub, ok).  Output
    order is cell-key order (see module docstring on ordering parity).
    """
    m = points.shape[0]
    valid = jnp.arange(m) < n_valid
    origin = _masked_origin(points, valid)
    inv_cell = jnp.float32(1.0) / jnp.float32(sample_dl)
    cc = _cell_coords(points, origin, inv_cell)
    in_grid = jnp.all((cc >= 0) & (cc < _GRID), axis=-1)
    ok = jnp.all(~valid | in_grid)
    key = jnp.where(valid & in_grid, _pack(jnp.clip(cc, 0, _GRID - 1)),
                    _KEY_INVALID)
    order = jnp.argsort(key)
    sk = key[order]
    v = sk != _KEY_INVALID
    first = jnp.concatenate([v[:1], v[1:] & (sk[1:] != sk[:-1])])
    cid = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_sub = jnp.max(jnp.where(v, cid + 1, 0))
    ok &= n_sub <= out_cap
    tgt = jnp.where(v & (cid < out_cap), cid, out_cap)
    sums = jnp.zeros((out_cap + 1, 3), jnp.float32).at[tgt].add(
        points[order], mode='drop')
    cnts = jnp.zeros((out_cap + 1,), jnp.float32).at[tgt].add(
        1.0, mode='drop')
    sub = sums[:out_cap] / jnp.maximum(cnts[:out_cap, None], 1.0)
    have = jnp.arange(out_cap) < n_sub
    sub = jnp.where(have[:, None], sub, _PAD_POS)
    return sub, n_sub, ok
