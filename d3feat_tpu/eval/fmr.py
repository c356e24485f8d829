"""Feature Matching Recall / inlier-ratio protocol.

Re-implementation of `geometric_registration/evaluate.py` (reference):
  * correspondences = mutual nearest neighbors in descriptor space using
    d = sqrt(2 - 2 * s.t) — valid for unit descriptors (`evaluate.py:11-27`);
  * a pair is counted if its GT overlap exists; inlier = correspondence
    within tau1 = 0.10 m after applying the GT transform;
  * FMR = fraction of pairs with inlier ratio > tau2 = 0.05
    (`evaluate.py:176-177`), with the 250 top-score keypoint budget
    (`evaluate.py:46-50`).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

TAU1 = 0.10     # inlier distance (m)
TAU2 = 0.05     # inlier-ratio threshold
NUM_KEYPTS = 250


def build_correspondence(source_desc: np.ndarray, target_desc: np.ndarray
                         ) -> np.ndarray:
    """Mutual-nearest correspondences under d = sqrt(2 - 2 s.t)
    (`evaluate.py:11-27`). Descriptors are assumed L2-normalized; the
    distance is monotone in -dot, so mutual-argmax of the dot suffices."""
    sim = source_desc @ target_desc.T
    fwd = np.argmax(sim, axis=1)
    bwd = np.argmax(sim, axis=0)
    src = np.arange(len(source_desc))
    keep = bwd[fwd] == src
    return np.stack([src[keep], fwd[keep]], axis=1)


def select_top_keypoints(keypts: np.ndarray, descs: np.ndarray,
                         scores: np.ndarray, num: int = NUM_KEYPTS
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-`num` by detection score (`evaluate.py:46-50` takes the last
    `num` of score-ascending dumps == highest scores)."""
    order = np.argsort(scores.reshape(-1))[-num:]
    return keypts[order], descs[order]


def select_nms_keypoints(keypts: np.ndarray, descs: np.ndarray,
                         scores: np.ndarray, num: int = NUM_KEYPTS,
                         radius: float = 0.06,
                         pool: int = 40,
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Top-`num` by detection score with greedy spatial NMS.

    An ABLATION selector, not the reference protocol (which takes the
    raw top-k, `evaluate.py:46-50`): D3Feat's raw scores cluster on
    high-saliency structures, so the top-250 often stack onto a few
    spots — the keypoint-ceiling analysis (RESULTS.md r3) showed 16% of
    eval pairs are geometrically unmatchable at raw top-250. Greedy
    suppression of anything within `radius` of an already-picked point
    spreads the same detector's budget across the cloud. Candidates are
    the raw top `pool*num` (scores ascending in the dumps); if
    suppression exhausts them before `num` are picked, the remainder is
    filled with the highest-scoring suppressed points.
    """
    from scipy.spatial import cKDTree

    m = min(len(scores), max(pool * num, num))
    cand = np.argsort(scores.reshape(-1))[-m:][::-1]   # descending score
    pts = keypts[cand]
    tree = cKDTree(pts)
    suppressed = np.zeros(m, dtype=bool)
    picked: list = []
    for idx in range(m):
        if suppressed[idx]:
            continue
        picked.append(idx)
        if len(picked) >= num:
            break
        suppressed[tree.query_ball_point(pts[idx], radius)] = True
    if len(picked) < num:
        rest = [i for i in range(m) if i not in set(picked)]
        picked.extend(rest[:num - len(picked)])
    sel = cand[np.asarray(picked, dtype=np.int64)]
    return keypts[sel], descs[sel]


def inlier_ratio_for_pair(
    src_keypts: np.ndarray,
    dst_keypts: np.ndarray,
    src_desc: np.ndarray,
    dst_desc: np.ndarray,
    gt_trans: np.ndarray,
    tau1: float = TAU1,
) -> Tuple[float, int]:
    """(inlier ratio, num correspondences) for one fragment pair; GT maps
    the *source* frame onto the target (`evaluate.py:54-78` semantics)."""
    corr = build_correspondence(src_desc, dst_desc)
    if len(corr) == 0:
        return 0.0, 0
    src = src_keypts[corr[:, 0]]
    dst = dst_keypts[corr[:, 1]]
    src_t = src @ gt_trans[:3, :3].T + gt_trans[:3, 3]
    dist = np.linalg.norm(src_t - dst, axis=1)
    return float(np.mean(dist < tau1)), len(corr)


def feature_matching_recall(
    inlier_ratios: Sequence[float],
    tau2: float = TAU2,
) -> float:
    """FMR over a set of evaluated pairs (`evaluate.py:190-230`)."""
    if not len(inlier_ratios):
        return 0.0
    return float(np.mean(np.asarray(inlier_ratios) > tau2))


def evaluate_scene_pairs(
    fragments: Dict[int, Dict[str, np.ndarray]],
    gt_pairs: List[Tuple[int, int, np.ndarray]],
    num_keypts: int = NUM_KEYPTS,
    tau1: float = TAU1,
    tau2: float = TAU2,
    nms_radius: float = 0.0,
) -> Dict[str, float]:
    """Evaluate one scene.

    Args:
      fragments: id -> {'keypts' [N,3], 'descriptors' [N,D], 'scores' [N]}.
      gt_pairs: (i, j, T_gt 4x4) with T_gt aligning fragment j onto i
        (the reference evaluates pair (i, j) by transforming j's keypoints,
        `evaluate.py:54-78`).
      nms_radius: > 0 switches keypoint selection to the spatial-NMS
        ablation (`select_nms_keypoints`); 0 = reference raw top-k.
    """
    if nms_radius > 0.0:
        def _select(f):
            return select_nms_keypoints(f['keypts'], f['descriptors'],
                                        f['scores'], num_keypts,
                                        radius=nms_radius)
    else:
        def _select(f):
            return select_top_keypoints(f['keypts'], f['descriptors'],
                                        f['scores'], num_keypts)
    ratios = []
    inliers = []
    for i, j, t_gt in gt_pairs:
        fi, fj = fragments[i], fragments[j]
        ki, di = _select(fi)
        kj, dj = _select(fj)
        r, n = inlier_ratio_for_pair(kj, ki, dj, di, t_gt, tau1)
        ratios.append(r)
        inliers.append(n)
    return {
        'recall': feature_matching_recall(ratios, tau2),
        'inlier_ratio': float(np.mean(ratios)) if ratios else 0.0,
        'avg_correspondences': float(np.mean(inliers)) if inliers else 0.0,
        'num_pairs': float(len(ratios)),
    }
