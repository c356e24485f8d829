"""Row gather with a gather-based backward (custom VJP).

The transpose of a row gather is a scatter-add, and XLA's TPU scatter is
~4.5x slower than its gather (measured: 65 ms vs 14.5 ms for the level-0
[N, K, 128] block). The host, however, can cheaply precompute the
*inverse adjacency* — for each table row m, the flat positions (n*K + k)
that reference it — turning the backward into another fixed-degree gather:

    forward:  out[n, k, :]   = table[inds[n, k], :]
    backward: dtable[m, :]   = sum_j dout_flat[inv[m, j], :]

`inverse_lists` builds the padded inverse on the host (pad = N*K, reading
an appended zero row). The in-degree bound K_inv must cover the true
maximum (the host raises otherwise) — unlike the forward lists, inverse
lists are NOT truncated, or gradients would silently drop.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def inverse_lists(inds: np.ndarray, n_rows: int, k_inv: int) -> np.ndarray:
    """Padded inverse adjacency of an index matrix.

    Args:
      inds: [N, K] int32 (entries in [0, n_rows]; n_rows == shadow).
      n_rows: number of gatherable table rows INCLUDING the shadow row
        (i.e. table.shape[0]); the shadow row's slot collects the padding.
      k_inv: static in-degree bound.

    Returns [n_rows, k_inv] int32 of flat positions into inds.reshape(-1),
    padded with N*K. Raises if any real row's in-degree exceeds k_inv.
    """
    flat = np.ascontiguousarray(inds, dtype=np.int64).reshape(-1)
    n_flat = flat.shape[0]
    order = np.argsort(flat, kind='stable')
    sorted_targets = flat[order]
    counts = np.bincount(sorted_targets, minlength=n_rows)[:n_rows]
    # the shadow row (last) legitimately exceeds any bound; exclude it
    real_max = int(counts[:-1].max()) if n_rows > 1 else 0
    if real_max > k_inv:
        raise ValueError(
            f'inverse-list overflow: max in-degree {real_max} > k_inv '
            f'{k_inv}; raise the inverse_k config for this level')
    out = np.full((n_rows, k_inv), n_flat, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    # positions within each group
    group_pos = np.arange(n_flat) - starts[sorted_targets]
    keep = group_pos < k_inv  # only the shadow row can exceed
    out[sorted_targets[keep], group_pos[keep]] = order[keep]
    return out


@partial(jax.custom_vjp, nondiff_argnums=())
def gather_rows(table: jax.Array, inds: jax.Array,
                inv: jax.Array) -> jax.Array:
    """table[inds] with a gather-based backward via ``inv``."""
    return table[inds]


def _gather_rows_fwd(table, inds, inv):
    return table[inds], (inds, inv)


def _gather_rows_bwd(res, dout):
    inds, inv = res
    # the cotangent dtype equals the primal table dtype in JAX
    tdtype = dout.dtype
    n, k = inds.shape
    dflat = dout.reshape(n * k, dout.shape[-1])
    dflat_ext = jnp.concatenate(
        [dflat, jnp.zeros((1, dflat.shape[1]), dflat.dtype)], axis=0)
    # [M, K_inv, L] gather then reduce — the scatter transpose, as a gather
    # (f32 accumulation; the scatter formulation would accumulate in the
    # table dtype). The shadow table row's inverse list is truncated, so
    # its cotangent may be partial — callers always discard that row
    # (lane_pad_table's backward extracts only the real feature rows).
    contrib = dflat_ext[inv]
    dtable = jnp.sum(contrib.astype(jnp.float32), axis=1).astype(tdtype)
    return (dtable, None, None)


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def maybe_gather_rows(table: jax.Array, inds: jax.Array,
                      inv: Optional[jax.Array]) -> jax.Array:
    """gather_rows when an inverse is available, else plain indexing
    (autodiff scatter backward)."""
    if inv is None:
        return table[inds]
    return gather_rows(table, inds, inv)
