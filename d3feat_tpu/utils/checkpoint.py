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

    DEVIATION from the reference, opt-in (``--rescale-kpoints`` in
    scripts/{test_eth,train_3dmatch}.py; default is reference parity).
    The reference stores dispositions in PHYSICAL units — exactly like our
    checkpoints: ``create_kernel_points`` returns ``kernel_points *
    radius`` (`kernels/kernel_points.py:181`) into a non-trainable
    ``kernel_points`` tf.Variable (`kernels/convolution_ops.py:137-148`)
    that the tester's Saver restores from the snapshot
    (`utils/tester.py:143-162`), overwriting the fresh ETH-geometry init.
    The reference ETH zero-shot eval therefore runs the TRAINED-scale
    kernel inside the 4x-rescaled neighborhoods (`test_eth.py:37-39`:
    dl 0.025->0.05, KP_extent 1.0->2.0) — only the influence extent
    stretches, not the disposition.  A commented-out
    ``v.assign(v * 0.10/0.03)`` rescale in `utils/tester.py:164-168`
    shows the author tried this very knob and shipped it disabled.

    This helper is the enabled version of that knob: multiply the
    restored dispositions by the KP_extent*dl ratio so the kernel
    geometry matches what a fresh init at the target radius would give.
    ``load_kernel_points`` is exactly linear in its radius argument
    (normalize -> *radius; the seeded rotation is orthonormal; the seeded
    jitter is normal(scale=radius*0.01)), so the rescaled tree is
    bit-close to a fresh target-geometry init for untrained dispositions
    (tests/test_train.py::
    test_rescale_kpoints_matches_fresh_init_at_target_geometry).
    """
    scale = ((target_cfg.KP_extent * target_cfg.first_subsampling_dl)
             / (trained_cfg.KP_extent * trained_cfg.first_subsampling_dl))
    if abs(scale - 1.0) < 1e-9:
        return kpoints
    return jax.tree.map(lambda kp: kp * scale, kpoints)


def geometry_scale(trained_cfg: Any, target_cfg: Any) -> float:
    """KP_extent*dl ratio between a snapshot's geometry and the target's
    (1.0 = same geometry; used to detect cross-geometry restores)."""
    return ((target_cfg.KP_extent * target_cfg.first_subsampling_dl)
            / (trained_cfg.KP_extent * trained_cfg.first_subsampling_dl))


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
