"""ETH zero-shot FMR from a descriptor dump + per-scene gt.log files.

Mirrors the reference's `geometric_registration_eth/evaluate_eth.py:113-177`:
mutual-NN correspondences among the top-250 keypoints, inlier < 0.10 m
after the GT transform, recall over the >30%-overlap (= gt.log) pairs,
reported per scene and as the scene mean. The gt.log files ship with the
ETH dataset download at `{data}/{scene}/gt.log`.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from d3feat_tpu.data.eth import ETH_SCENES
from d3feat_tpu.eval.benchmark_logs import load_log
from d3feat_tpu.eval.fmr import evaluate_scene_pairs


def load_dump_scene(out_dir: str, scene: str) -> Dict[int, Dict[str, np.ndarray]]:
    """Read one scene of a reference-layout dump
    ({descriptors,keypoints,scores}/{scene}/cloud_bin_N.npy)."""
    desc_dir = os.path.join(out_dir, 'descriptors', scene)
    frags: Dict[int, Dict[str, np.ndarray]] = {}
    for f in os.listdir(desc_dir):
        num = int(f.split('_')[-1].split('.')[0])
        frags[num] = {
            'descriptors': np.load(os.path.join(desc_dir, f)),
            'keypts': np.load(os.path.join(
                out_dir, 'keypoints', scene, f'cloud_bin_{num}.npy')),
            'scores': np.load(os.path.join(
                out_dir, 'scores', scene, f'cloud_bin_{num}.npy')),
        }
    return frags


def evaluate_eth_fmr(out_dir: str, gt_root: str, num_keypts: int = 250,
                     scenes=ETH_SCENES, verbose: bool = True
                     ) -> Optional[Dict[str, Dict[str, float]]]:
    """Per-scene + mean ETH FMR. Returns None when no gt.log is found."""
    have_gt = [s for s in scenes
               if os.path.exists(os.path.join(gt_root, s, 'gt.log'))]
    if not have_gt:
        if verbose:
            print(f'no {{scene}}/gt.log under {gt_root}; skipping FMR '
                  f'(pass --gt to point at the ETH ground truth)')
        return None

    scene_stats: Dict[str, Dict[str, float]] = {}
    total_good = total_gt = 0
    for scene in have_gt:
        gt = load_log(os.path.join(gt_root, scene, 'gt.log'))
        frags = load_dump_scene(out_dir, scene)
        pairs = [(int(k.split('_')[0]), int(k.split('_')[1]), t)
                 for k, t in gt.items()]
        stats = evaluate_scene_pairs(frags, pairs, num_keypts=num_keypts)
        scene_stats[scene] = stats
        total_good += int(round(stats['recall'] * stats['num_pairs']))
        total_gt += int(stats['num_pairs'])
        if verbose:
            print(f'{scene}: recall={stats["recall"]:.4f} '
                  f'inlier_ratio={stats["inlier_ratio"]:.4f} '
                  f'({int(stats["num_pairs"])} gt pairs)')
    mean_recall = float(np.mean([s['recall'] for s in scene_stats.values()]))
    scene_stats['__mean__'] = {
        'recall': mean_recall,
        'pair_weighted_recall': total_good / max(total_gt, 1),
        'num_pairs': float(total_gt),
    }
    if verbose:
        print(f'mean ETH FMR over {len(have_gt)} scenes: {mean_recall:.4f}')
        print(f'pair-weighted ETH FMR: {total_good / max(total_gt, 1):.4f} '
              f'({total_good}/{total_gt})')
    return scene_stats
