"""Dump a snapshot's kernel-point dispositions (.ply) and weights (.npy)
for visualization — the reference trainer's `save_kernel_points`
(`utils/trainer.py:503-557`), as an offline tool over orbax snapshots
instead of a per-epoch hook (our checkpoints already persist the
dispositions; this just exports them in the reference's inspectable
formats).

Writes {snapshot}/kernel_points/: per-level `level{l}_kernel_points.ply`
(x,y,z) and every conv weight as a flattened-name `.npy`.

Usage:
  python scripts/dump_kernel_points.py --snapshot results/Log_X[/snap-N]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--snapshot', required=True,
                    help='log dir (uses latest snap-N) or a snap-N path')
    ap.add_argument('--out', default=None,
                    help='output dir (default {log_dir}/kernel_points/'
                         'snap-N)')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import Config
    from d3feat_tpu.data.ply import write_ply
    from d3feat_tpu.models.kpfcnn import init_variables
    from d3feat_tpu.train.trainer import create_train_state
    from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                             restore_checkpoint)

    snap = args.snapshot
    if not os.path.basename(snap.rstrip('/')).startswith('snap-'):
        snap = latest_snapshot(snap)
    log_dir = os.path.dirname(os.path.abspath(snap))
    cfg = Config.load(os.path.join(log_dir, 'parameters.txt'))
    state = restore_checkpoint(snap, create_train_state(
        cfg, init_variables(cfg)))
    out = args.out or os.path.join(log_dir, 'kernel_points',
                                   os.path.basename(snap))
    os.makedirs(out, exist_ok=True)

    for name, kp in sorted(state.kpoints.items()):
        kp = np.asarray(kp)
        write_ply(os.path.join(out, f'{name}_kernel_points.ply'),
                  [kp.astype(np.float32)], ['x', 'y', 'z'])
        print(f'{name}: {kp.shape[0]} kernel points, '
              f'radius {np.abs(kp).max():.4f} m')

    def walk(tree, prefix=''):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f'{prefix}_{k}' if prefix else k)
        else:
            arr = np.asarray(tree)
            if arr.ndim >= 2:            # conv/unary weights, not biases/BN
                np.save(os.path.join(out, f'{prefix}.npy'), arr)

    walk(jax.device_get(state.params))
    n_npy = len([f for f in os.listdir(out) if f.endswith('.npy')])
    print(f'wrote {len(state.kpoints)} kernel .ply + {n_npy} weight .npy '
          f'under {out}')


if __name__ == '__main__':
    main()
