"""Checkpoint save/restore (orbax).

Replaces the reference's tf.train.Saver snapshots (`utils/trainer.py:62-63,
366-372`). A checkpoint persists the full TrainState pytree — params, BN
running stats, the per-conv kernel-point dispositions (model semantics, not
just speed; see `kernels/kernel_points.py:249-278` nondeterminism), and
optimizer state — next to the self-describing `parameters.txt`.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template TrainState or
    variables pytree with correct shapes/dtypes)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(target))


def latest_snapshot(save_dir: str) -> str | None:
    """Find the newest `snap-N` in a log dir (reference auto-pick,
    `test_3dmatch.py:104-134`)."""
    snaps = []
    if not os.path.isdir(save_dir):
        return None
    for name in os.listdir(save_dir):
        if name.startswith('snap-'):
            try:
                snaps.append((int(name.split('-')[1]), name))
            except ValueError:
                continue
    if not snaps:
        return None
    return os.path.join(save_dir, max(snaps)[1])
