"""Evaluate an existing descriptor dump: FMR, RANSAC est.log, recall.

Decouples evaluation from extraction (`test_3dmatch.py` does both): the
dump layout is `runtime.generate_descriptors`'s, the protocol is the
reference's (`geometric_registration/evaluate.py:160-230` FMR; Choi
recall via `eval/recall.py`). Runs entirely on the host CPU, so it can
chew through hundreds of RANSAC pairs while the accelerator trains.
Scenes evaluate in a process pool like the reference
(`geometric_registration/evaluate.py:181-186`, Pool over 8 scenes);
`--workers` defaults to min(8, cpu_count) — on a 1-core host that is
sequential, which is also the measured-honest choice there.

Usage:
  python scripts/evaluate_dump.py --dump geometric_registration/D3Feat_x \
      --gt data/synth3dm/gt_result [--ransac] [--num-keypts 250]
      [--workers N]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def _gt_dir(gt_root, scene):
    for cand in (scene, scene + '-evaluation'):
        p = os.path.join(gt_root, cand)
        if os.path.isdir(p):
            return p
    raise FileNotFoundError(f'no gt dir for {scene} under {gt_root}')


def _eval_scene(task):
    """One scene's FMR (+ optional RANSAC est.log + Choi recall).
    Module-level so a multiprocessing Pool can pickle it."""
    (scene, dump, gt_root, num_keypts, nms_radius, ransac) = task
    from d3feat_tpu.eval.benchmark_logs import load_log, write_log
    from d3feat_tpu.eval.fmr import (evaluate_scene_pairs,
                                     select_nms_keypoints,
                                     select_top_keypoints)
    from d3feat_tpu.eval.recall import load_info, registration_recall
    from d3feat_tpu.eval.registration import ransac_registration

    gt = load_log(os.path.join(_gt_dir(gt_root, scene), 'gt.log'))
    desc_dir = os.path.join(dump, 'descriptors', scene)
    frags = {}
    for f in os.listdir(desc_dir):
        num = int(f.split('_')[-1].split('.')[0])
        frags[num] = {
            'descriptors': np.load(os.path.join(desc_dir, f)),
            'keypts': np.load(os.path.join(
                dump, 'keypoints', scene, f'cloud_bin_{num}.npy')),
            'scores': np.load(os.path.join(
                dump, 'scores', scene, f'cloud_bin_{num}.npy')),
        }
    pairs = [(int(k.split('_')[0]), int(k.split('_')[1]), t)
             for k, t in gt.items()]
    stats = evaluate_scene_pairs(frags, pairs, num_keypts=num_keypts,
                                 nms_radius=nms_radius)
    scene_out = {k: float(v) for k, v in stats.items()}
    reg_recall = None

    if ransac:
        records = []
        n_frag = len(frags)

        def _sel(f):
            if nms_radius > 0.0:
                return select_nms_keypoints(
                    f['keypts'], f['descriptors'], f['scores'],
                    num_keypts, radius=nms_radius)
            return select_top_keypoints(
                f['keypts'], f['descriptors'], f['scores'], num_keypts)

        for i, j, _ in pairs:
            ki, di = _sel(frags[i])
            kj, dj = _sel(frags[j])
            t_est, _, _ = ransac_registration(
                kj, ki, dj, di, distance_threshold=0.05,
                max_iters=50000)
            records.append((i, j, n_frag, t_est))
        write_log(os.path.join(dump, 'est_logs', scene,
                               f'{scene}.log'), records)
        info_path = os.path.join(_gt_dir(gt_root, scene), 'gt.info')
        if os.path.exists(info_path):
            est = load_log(os.path.join(dump, 'est_logs', scene,
                                        f'{scene}.log'))
            rstats = registration_recall(est, gt, load_info(info_path))
            scene_out['reg_recall'] = float(rstats['recall'])
            reg_recall = (float(rstats['recall']), int(rstats['good']),
                          int(rstats['gt_num']))
    return scene, scene_out, reg_recall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dump', required=True)
    ap.add_argument('--gt', required=True)
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--ransac', action='store_true')
    ap.add_argument('--workers', type=int,
                    default=min(8, os.cpu_count() or 1),
                    help='scene-parallel processes (reference uses a '
                         'Pool of 8, evaluate.py:181-186); 1 = inline')
    ap.add_argument('--nms-radius', type=float, default=0.0,
                    help='> 0: spatial-NMS keypoint selection ablation '
                         '(eval.fmr.select_nms_keypoints) instead of the '
                         'reference raw top-k')
    ap.add_argument('--json-out', default=None,
                    help='append one JSON line with the full stats')
    args = ap.parse_args()

    from d3feat_tpu.runtime.tester import read_dump_meta
    scenes = sorted(os.listdir(os.path.join(args.dump, 'descriptors')))
    out = {'scenes': {}, 'num_keypts': args.num_keypts,
           'nms_radius': args.nms_radius,
           # numeric identity of the dump (pyramid path + dtypes): results
           # are only comparable pair-for-pair across equal signatures
           'path': read_dump_meta(args.dump)}
    tasks = [(s, args.dump, args.gt, args.num_keypts, args.nms_radius,
              args.ransac) for s in scenes]
    if args.workers > 1 and len(scenes) > 1:
        from multiprocessing import Pool
        with Pool(args.workers) as pool:
            results = pool.map(_eval_scene, tasks)
    else:
        results = [_eval_scene(t) for t in tasks]

    recalls = []
    for scene, scene_out, reg in results:
        out['scenes'][scene] = scene_out
        print(f'{scene}: recall={scene_out["recall"]:.4f} '
              f'inlier_ratio={scene_out["inlier_ratio"]:.4f} '
              f'({int(scene_out["num_pairs"])} pairs)', flush=True)
        if reg is not None:
            r, good, gt_num = reg
            recalls.append(r)
            print(f'{scene}: registration recall {r:.4f} '
                  f'({good}/{gt_num})', flush=True)

    out['fmr'] = float(np.mean([s['recall']
                                for s in out['scenes'].values()]))
    out['inlier_ratio'] = float(np.mean(
        [s['inlier_ratio'] for s in out['scenes'].values()]))
    print(f'\naverage FMR over {len(scenes)} scenes: {out["fmr"]:.4f} '
          f'(mean inlier ratio {out["inlier_ratio"]:.4f})')
    if recalls:
        out['reg_recall'] = float(np.mean(recalls))
        print(f'mean registration recall: {out["reg_recall"]:.4f}')
    if args.json_out:
        with open(args.json_out, 'a') as fh:
            fh.write(json.dumps({'dump': args.dump, **out}) + '\n')


if __name__ == '__main__':
    main()
