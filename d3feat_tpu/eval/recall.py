"""Registration recall — Choi et al. protocol, pure Python.

Re-implementation of the reference's MATLAB harness
(`geometric_registration/3dmatch/evaluate.m` + ElasticReconstruction's
`mrEvaluateRegistration.m` / `mrLoadInfo.m`), removing the MATLAB
dependency:

  * ground truth: gt.log transforms + gt.info 6x6 information matrices;
    only non-adjacent pairs (j - i > 1) count;
  * per estimated pair: dT = T_gt^-1 @ T_est, xi = [translation;
    -quaternion_xyz], error p = xi^T Lambda xi / Lambda[0,0];
  * a pair is correct if p <= err2 (default 0.04 = (0.2 m)^2);
  * recall = correct / |gt non-adjacent|, precision = correct / |est
    non-adjacent|.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from d3feat_tpu.eval.benchmark_logs import load_log

ERR2 = 0.04


def load_info(path: str) -> Dict[str, Tuple[int, np.ndarray]]:
    """gt.info reader (`mrLoadInfo.m`): per record a header "i j n" and a
    6x6 information matrix. Returns {'i_j': (n, mat)}."""
    out: Dict[str, Tuple[int, np.ndarray]] = {}
    with open(path) as fh:
        tokens = fh.read().split()
    pos = 0
    while pos + 39 <= len(tokens):
        i, j, n = (int(tokens[pos]), int(tokens[pos + 1]),
                   int(tokens[pos + 2]))
        mat = np.array([float(x) for x in tokens[pos + 3:pos + 39]]
                       ).reshape(6, 6)
        out[f'{i}_{j}'] = (n, mat)
        pos += 39
    return out


def _dcm_to_quat(r: np.ndarray) -> np.ndarray:
    """Aerospace-toolbox dcm2quat convention (as used by
    mrComputeTransformationError): quaternion [w, x, y, z] of the DCM,
    i.e. the conjugate of the rotation-matrix quaternion.

    Full 4-branch Shepperd construction — the w-only branch is
    numerically garbage for rotations near 180 deg (trace -> -1, w -> 0),
    exactly the wrong-by-a-lot estimates the recall metric must reject.
    """
    m00, m01, m02 = r[0]
    m10, m11, m12 = r[1]
    m20, m21, m22 = r[2]
    tr = m00 + m11 + m22
    if tr > 0.0:
        s = 2.0 * np.sqrt(tr + 1.0)
        w = 0.25 * s
        x = (m21 - m12) / s
        y = (m02 - m20) / s
        z = (m10 - m01) / s
    elif m00 >= m11 and m00 >= m22:
        s = 2.0 * np.sqrt(1.0 + m00 - m11 - m22)
        w = (m21 - m12) / s
        x = 0.25 * s
        y = (m01 + m10) / s
        z = (m02 + m20) / s
    elif m11 >= m22:
        s = 2.0 * np.sqrt(1.0 + m11 - m00 - m22)
        w = (m02 - m20) / s
        x = (m01 + m10) / s
        y = 0.25 * s
        z = (m12 + m21) / s
    else:
        s = 2.0 * np.sqrt(1.0 + m22 - m00 - m11)
        w = (m10 - m01) / s
        x = (m02 + m20) / s
        y = (m12 + m21) / s
        z = 0.25 * s
    q = np.array([w, -x, -y, -z])  # conjugate: DCM = rotation^T
    if q[0] < 0:  # MATLAB returns the positive-scalar representative
        q = -q
    return q


def transformation_error(delta: np.ndarray, info: np.ndarray) -> float:
    """p = xi^T Lambda xi / Lambda[0,0] with xi = [t; -q_xyz]
    (`mrEvaluateRegistration.m:mrComputeTransformationError`)."""
    te = delta[:3, 3]
    q = _dcm_to_quat(delta[:3, :3])
    xi = np.concatenate([te, -q[1:4]])
    return float(xi @ info @ xi / info[0, 0])


def registration_recall(
    est_log: Dict[str, np.ndarray],
    gt_log: Dict[str, np.ndarray],
    gt_info: Dict[str, Tuple[int, np.ndarray]],
    err2: float = ERR2,
) -> Dict[str, float]:
    """Evaluate one scene. Log dicts map 'i_j' -> 4x4 transform."""
    def non_adjacent(keys):
        return [k for k in keys
                if int(k.split('_')[1]) - int(k.split('_')[0]) > 1]

    gt_keys = set(non_adjacent(gt_log.keys()))
    gt_num = len(gt_keys)
    good = 0
    rs_num = 0
    errors: List[float] = []
    for key in non_adjacent(est_log.keys()):
        rs_num += 1
        if key not in gt_keys:
            continue  # false positive: no GT overlap for this pair
        delta = np.linalg.inv(gt_log[key]) @ est_log[key]
        p = transformation_error(delta, gt_info[key][1])
        errors.append(p)
        if p <= err2:
            good += 1
    return {
        'recall': good / gt_num if gt_num else 0.0,
        'precision': good / rs_num if rs_num else 0.0,
        'gt_num': float(gt_num),
        'good': float(good),
        'mean_error': float(np.mean(errors)) if errors else float('inf'),
    }


def evaluate_scenes(est_root: str, gt_root: str, scenes,
                    est_name: str = '{scene}.log',
                    err2: float = ERR2) -> Dict[str, Dict[str, float]]:
    """Multi-scene evaluation mirroring `evaluate.m`: prints per-scene
    recall and the pair-weighted total."""
    out = {}
    total_gt = 0
    total_tp = 0
    for scene in scenes:
        gt = load_log(os.path.join(gt_root, scene, 'gt.log'))
        info = load_info(os.path.join(gt_root, scene, 'gt.info'))
        est = load_log(os.path.join(est_root, scene,
                                    est_name.format(scene=scene)))
        stats = registration_recall(est, gt, info, err2)
        out[scene] = stats
        total_gt += int(stats['gt_num'])
        total_tp += int(stats['good'])
    out['__total__'] = {
        'recall': total_tp / total_gt if total_gt else 0.0,
        'gt_num': float(total_gt),
        'good': float(total_tp),
    }
    return out
