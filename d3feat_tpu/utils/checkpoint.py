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


def rescale_kpoints(kpoints: Any, trained_cfg: Any, target_cfg: Any) -> Any:
    """Rescale restored kernel-point dispositions across a geometry change.

    The reference stores dispositions NORMALIZED and multiplies by the
    layer kernel radius at graph build (`kernels/convolution_ops.py:128`),
    so evaluating a 3DMatch-trained model at the ETH rescaled geometry
    (`test_eth.py:37-39`: first_subsampling_dl 0.025->0.05, KP_extent
    1.0->2.0) rescales the kernel geometry automatically.  We checkpoint
    dispositions in PHYSICAL units (k_radius = 1.5*KP_extent*dl0*2^l), so
    a cross-geometry restore must multiply them by the radius ratio —
    otherwise the restored kernel sits at 1/4 the neighborhood scale and
    every influence weight collapses toward the center point.

    ``load_kernel_points`` is exactly linear in its radius argument
    (normalize -> *radius; the seeded rotation is orthonormal; the seeded
    jitter is normal(scale=radius*0.01)), so this rescale reproduces both
    the reference semantics for trained dispositions and the fresh-init
    values for untrained ones (tests/test_checkpoint.py).
    """
    scale = ((target_cfg.KP_extent * target_cfg.first_subsampling_dl)
             / (trained_cfg.KP_extent * trained_cfg.first_subsampling_dl))
    if scale == 1.0:
        return kpoints
    return jax.tree.map(lambda kp: kp * scale, kpoints)


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
