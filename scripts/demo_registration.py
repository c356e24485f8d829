"""End-to-end demo: dense D3Feat descriptors + RANSAC registration.

The minimum end-to-end slice (reference `demo_registration.py`): load the
two demo fragments, voxel-downsample at 3 cm, extract per-point descriptors
and detection scores, dump `.npz{keypts, features, scores}` in the
reference layout (`demo_registration.py:165-170`), then register with
feature-matching RANSAC and report the transform.

Usage:
  python scripts/demo_registration.py [--data DIR] [--snapshot DIR]
                                      [--num-keypts 250] [--cpu]

Without a snapshot the model runs with fresh (seeded) weights — useful as a
pipeline smoke test; registration quality then reflects untrained features.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data', default='/root/reference/demo_data')
    ap.add_argument('--device-pyramid', action='store_true',
                    help='build the multiscale pyramid on the accelerator\n'
                         '(data/pyramid_device.py) instead of the host')
    ap.add_argument('--snapshot', default=None,
                    help='checkpoint dir (with parameters.txt + snap-N)')
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--out', default='demo_out')
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from d3feat_tpu.config import Config, threedmatch_config
    from d3feat_tpu.data.ply import read_ply_points
    from d3feat_tpu.data.batching import make_test_batch
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.ops import grid_subsample
    from d3feat_tpu.runtime import DescriptorExtractor
    from d3feat_tpu.eval.registration import (ransac_registration,
                                              apply_transform)

    clouds = []
    for name in ('cloud_bin_0.ply', 'cloud_bin_1.ply'):
        raw = read_ply_points(os.path.join(args.data, name))
        sub = grid_subsample(raw, 0.03)
        clouds.append(sub)
        print(f'{name}: {len(raw)} -> {len(sub)} pts @ 3cm')

    if args.snapshot:
        cfg = Config.load(os.path.join(args.snapshot, 'parameters.txt'))
        max_n = max(len(c) for c in clouds)
        cfg = cfg.replace(max_points=-(-max_n // cfg.size_multiple)
                          * cfg.size_multiple)
    else:
        max_n = max(len(c) for c in clouds)
        cfg = threedmatch_config(
            size_multiple=1024,
            max_points=-(-max_n // 1024) * 1024)

    batch = make_test_batch(clouds[0], cfg)
    model, variables = init_kpfcnn(cfg, batch['pyramid'])
    if args.snapshot:
        from d3feat_tpu.utils.checkpoint import (latest_snapshot,
                                                 restore_checkpoint)
        from d3feat_tpu.train.trainer import create_train_state
        snap = latest_snapshot(args.snapshot)
        state = restore_checkpoint(snap,
                                   create_train_state(cfg, variables))
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats,
                     'kpoints': state.kpoints}
        print(f'restored {snap}')

    extractor = DescriptorExtractor(cfg, variables,
                                    device_pyramid=args.device_pyramid)
    os.makedirs(args.out, exist_ok=True)
    results = []
    for i, cloud in enumerate(clouds):
        desc, score = extractor.extract(cloud)
        order = np.argsort(score)[-args.num_keypts:]
        np.savez(os.path.join(args.out, f'cloud_bin_{i}.npz'),
                 keypts=cloud[order], features=desc[order],
                 scores=score[order])
        results.append((cloud[order], desc[order]))
        print(f'fragment {i}: {len(cloud)} pts, extract '
              f'{extractor.timer[-1] * 1e3:.0f} ms')

    (kp0, d0), (kp1, d1) = results
    t0 = time.perf_counter()
    trans, inliers, fitness = ransac_registration(
        kp0, kp1, d0, d1, distance_threshold=0.05, max_iters=50000)
    print(f'RANSAC: {time.perf_counter() - t0:.1f} s, '
          f'{len(inliers)} inliers, fitness {fitness:.3f}')
    np.set_printoptions(precision=3, suppress=True)
    print('estimated transform:')
    print(trans)
    resid = np.linalg.norm(
        apply_transform(kp0[inliers[:, 0]], trans) - kp1[inliers[:, 1]],
        axis=1).mean() if len(inliers) else float('nan')
    print(f'mean inlier residual: {resid:.4f} m')

    # keypoint visualization dump (reference demo draws top-50 keypoints,
    # demo_registration.py:212-270; headless here -> write PLYs instead)
    from d3feat_tpu.data.ply import write_ply
    for i, (kp, _) in enumerate(results):
        write_ply(os.path.join(args.out, f'keypoints_{i}.ply'),
                  [kp[-50:]], ['x', 'y', 'z'])
    write_ply(os.path.join(args.out, 'cloud_0_aligned.ply'),
              [apply_transform(clouds[0], trans).astype(np.float32)],
              ['x', 'y', 'z'])
    print(f'wrote keypoint + aligned-cloud PLYs under {args.out}')


if __name__ == '__main__':
    main()
