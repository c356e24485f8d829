"""Keypoint repeatability protocol.

Re-implementation of `repeatability/evaluate_3dmatch_our.py:11-77` /
`evaluate_kitti_our.py:12-64` (reference): for a fragment pair with GT
alignment, a keypoint of cloud A is *repeatable* if some top-k keypoint of
cloud B lies within `threshold` after alignment. Thresholds: 0.1 m
(3DMatch) / 0.5 m (KITTI); k sweeps {4, 8, ..., 512}.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
from scipy.spatial import cKDTree

K_SWEEP = (4, 8, 16, 32, 64, 128, 256, 512)


def keypoint_repeatability(
    keypts_a: np.ndarray,      # [Na, 3] score-descending keypoints
    keypts_b: np.ndarray,      # [Nb, 3]
    gt_trans: np.ndarray,      # aligns A onto B
    threshold: float = 0.1,
    k_sweep: Sequence[int] = K_SWEEP,
) -> Dict[int, float]:
    """{k: repeatability} over the k sweep."""
    a_t = keypts_a @ gt_trans[:3, :3].T + gt_trans[:3, 3]
    out = {}
    for k in k_sweep:
        ka = a_t[:k]
        kb = keypts_b[:k]
        if len(ka) == 0 or len(kb) == 0:
            out[k] = 0.0
            continue
        tree = cKDTree(kb)
        d, _ = tree.query(ka, k=1, workers=-1)
        out[k] = float(np.mean(d < threshold))
    return out
