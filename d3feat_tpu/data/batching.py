"""Training-batch assembly: fragment pair -> static-shape model inputs.

Replaces the generator+tf_map contract of the reference
(`datasets/ThreeDMatch.py:200-308`, `datasets/common.py:1301-1413`): given
an (anchor, positive) pair with correspondence indices, produce the padded
pyramid plus the correspondence tensors the train step consumes.

Correspondence conventions (reference `models/KPFCNN_model.py:129-154`):
  * anc/pos indices address rows of the *stacked* level-0 cloud (positive
    indices offset by len(anchor), `datasets/ThreeDMatch.py:229`);
  * `keypts_dists` are spatial distances between the **unaugmented** anchor
    keypoints (backup points), feeding the safe-radius false-negative mask;
  * exactly `keypts_num` correspondences are sampled **with replacement**
    when enough exist; fewer are padded + masked (triggering the loss's
    skip-batch rule below keypts_num/2).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.data.augment import augment_cloud
from d3feat_tpu.data.pyramid import build_pyramid


def make_training_batch(
    anc_points: np.ndarray,
    pos_points: np.ndarray,
    correspondences: np.ndarray,     # [n_corr, 2] (anchor idx, positive idx)
    config: Config,
    rng: Optional[np.random.Generator] = None,
    augment: bool = True,
) -> Dict:
    """Build one train/val batch from a fragment pair."""
    anc_points = anc_points.astype(np.float32)
    pos_points = pos_points.astype(np.float32)
    backup_anc = anc_points

    if augment:
        assert rng is not None, 'augmentation needs an rng'
        kw = dict(noise=config.augment_noise,
                  num_axis=1 if config.augment_rotation else 0,
                  scale_min=config.augment_scale_min,
                  scale_max=config.augment_scale_max,
                  shift_range=config.augment_shift_range)
        anc_points = augment_cloud(anc_points, rng, **kw)
        pos_points = augment_cloud(pos_points, rng, **kw)

    m = config.keypts_num
    n_corr = len(correspondences)
    if n_corr > 0:
        if rng is not None:
            # exactly keypts_num samples WITH replacement, like
            # np.random.choice(..., keypts_num, replace=True)
            # (datasets/ThreeDMatch.py:225-229)
            sel = rng.integers(0, n_corr, size=m)
        else:
            sel = np.arange(min(m, n_corr))
        corr = correspondences[sel]
    else:
        corr = np.zeros((0, 2), np.int64)

    n_sel = corr.shape[0]
    anc_inds = np.zeros(m, np.int32)
    pos_inds = np.zeros(m, np.int32)
    valid = np.zeros(m, bool)
    anc_inds[:n_sel] = corr[:, 0]
    pos_inds[:n_sel] = corr[:, 1] + len(anc_points)
    valid[:n_sel] = True

    # spatial distances between unaugmented anchor keypoints
    kp = backup_anc[anc_inds]
    keypts_dists = np.sqrt(
        np.sum((kp[:, None] - kp[None, :]) ** 2, axis=-1) + 1e-12
    ).astype(np.float32)

    stacked = np.concatenate([anc_points, pos_points], axis=0)
    pyramid = build_pyramid(stacked, [len(anc_points), len(pos_points)],
                            config,
                            with_inverse=config.train_inverse_gather)
    return {
        'pyramid': pyramid,
        'anc_inds': anc_inds,
        'pos_inds': pos_inds,
        'corr_valid': valid,
        'keypts_dists': keypts_dists,
    }


def make_test_batch(points: np.ndarray, config: Config) -> Dict:
    """Inference input for a single fragment: the reference's test generator
    duplicates each fragment as anchor+positive (`test_3dmatch.py` path via
    `datasets/ThreeDMatch.py:326-368`); here a single cloud suffices."""
    points = points.astype(np.float32)
    return {'pyramid': build_pyramid(points, [len(points)], config)}


def make_test_batch_multi(points_list, config: Config) -> Dict:
    """Inference input for SEVERAL fragments in one dispatch: the clouds
    stack along the point axis as B independent segments (the same
    machinery training uses for its anchor+positive pair), so one XLA call
    extracts descriptors for the whole group — amortizing the per-dispatch
    tunnel round trips that dominate single-fragment extraction on
    remote TPUs (the reference extracts one fragment per session.run,
    `utils/tester.py:177-233`).  `config.max_points` must cover the sum of
    cloud sizes.  Per-fragment outputs live at cumulative-length offsets
    of the level-0 rows."""
    pts = [np.asarray(p, np.float32) for p in points_list]
    stacked = np.concatenate(pts, axis=0)
    return {'pyramid': build_pyramid(stacked, [len(p) for p in pts],
                                     config)}
