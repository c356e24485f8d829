"""Evaluate an existing descriptor dump: FMR, RANSAC est.log, recall.

Decouples evaluation from extraction (`test_3dmatch.py` does both): the
dump layout is `runtime.generate_descriptors`'s, the protocol is the
reference's (`geometric_registration/evaluate.py:160-230` FMR; Choi
recall via `eval/recall.py`). Runs entirely on the host CPU, so it can
chew through hundreds of RANSAC pairs while the accelerator trains.

Usage:
  python scripts/evaluate_dump.py --dump geometric_registration/D3Feat_x \
      --gt data/synth3dm/gt_result [--ransac] [--num-keypts 250]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dump', required=True)
    ap.add_argument('--gt', required=True)
    ap.add_argument('--num-keypts', type=int, default=250)
    ap.add_argument('--ransac', action='store_true')
    ap.add_argument('--nms-radius', type=float, default=0.0,
                    help='> 0: spatial-NMS keypoint selection ablation '
                         '(eval.fmr.select_nms_keypoints) instead of the '
                         'reference raw top-k')
    ap.add_argument('--json-out', default=None,
                    help='append one JSON line with the full stats')
    args = ap.parse_args()

    from d3feat_tpu.eval.benchmark_logs import load_log, write_log
    from d3feat_tpu.eval.fmr import (evaluate_scene_pairs,
                                     select_nms_keypoints,
                                     select_top_keypoints)
    from d3feat_tpu.eval.recall import load_info, registration_recall
    from d3feat_tpu.eval.registration import ransac_registration

    def gt_dir(scene):
        for cand in (scene, scene + '-evaluation'):
            p = os.path.join(args.gt, cand)
            if os.path.isdir(p):
                return p
        raise FileNotFoundError(f'no gt dir for {scene} under {args.gt}')

    from d3feat_tpu.runtime.tester import read_dump_meta
    scenes = sorted(os.listdir(os.path.join(args.dump, 'descriptors')))
    out = {'scenes': {}, 'num_keypts': args.num_keypts,
           'nms_radius': args.nms_radius,
           # numeric identity of the dump (pyramid path + dtypes): results
           # are only comparable pair-for-pair across equal signatures
           'path': read_dump_meta(args.dump)}
    recalls = []
    for scene in scenes:
        gt = load_log(os.path.join(gt_dir(scene), 'gt.log'))
        desc_dir = os.path.join(args.dump, 'descriptors', scene)
        frags = {}
        for f in os.listdir(desc_dir):
            num = int(f.split('_')[-1].split('.')[0])
            frags[num] = {
                'descriptors': np.load(os.path.join(desc_dir, f)),
                'keypts': np.load(os.path.join(
                    args.dump, 'keypoints', scene, f'cloud_bin_{num}.npy')),
                'scores': np.load(os.path.join(
                    args.dump, 'scores', scene, f'cloud_bin_{num}.npy')),
            }
        pairs = [(int(k.split('_')[0]), int(k.split('_')[1]), t)
                 for k, t in gt.items()]
        stats = evaluate_scene_pairs(frags, pairs,
                                     num_keypts=args.num_keypts,
                                     nms_radius=args.nms_radius)
        out['scenes'][scene] = {k: float(v) for k, v in stats.items()}
        print(f'{scene}: recall={stats["recall"]:.4f} '
              f'inlier_ratio={stats["inlier_ratio"]:.4f} '
              f'({int(stats["num_pairs"])} pairs)', flush=True)

        if args.ransac:
            records = []
            n_frag = len(frags)
            def _sel(f):
                if args.nms_radius > 0.0:
                    return select_nms_keypoints(
                        f['keypts'], f['descriptors'], f['scores'],
                        args.num_keypts, radius=args.nms_radius)
                return select_top_keypoints(
                    f['keypts'], f['descriptors'], f['scores'],
                    args.num_keypts)
            for i, j, _ in pairs:
                ki, di = _sel(frags[i])
                kj, dj = _sel(frags[j])
                t_est, _, _ = ransac_registration(
                    kj, ki, dj, di, distance_threshold=0.05,
                    max_iters=50000)
                records.append((i, j, n_frag, t_est))
            write_log(os.path.join(args.dump, 'est_logs', scene,
                                   f'{scene}.log'), records)
            info_path = os.path.join(gt_dir(scene), 'gt.info')
            if os.path.exists(info_path):
                est = load_log(os.path.join(args.dump, 'est_logs', scene,
                                            f'{scene}.log'))
                rstats = registration_recall(est, gt,
                                             load_info(info_path))
                out['scenes'][scene]['reg_recall'] = float(
                    rstats['recall'])
                recalls.append(rstats['recall'])
                print(f'{scene}: registration recall '
                      f'{rstats["recall"]:.4f} '
                      f'({int(rstats["good"])}/{int(rstats["gt_num"])})',
                      flush=True)

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
