"""3DMatch dataset adapter.

Re-implementation of `datasets/ThreeDMatch.py` (reference): loads the same
pre-generated pickles (`3DMatch_{split}_{voxel:.3f}_points.pkl` — dict
id -> [N,3]; `..._keypts.pkl` — dict "anc@pos" -> [M,2] correspondence
indices), yields training pairs with the reference's sampling rules, and
prepares the 8-scene official test fragments.

Training pair protocol (`ThreeDMatch.py:200-308`):
  * random positive for each anchor; skip clouds >80k or <2k points;
  * exactly `keypts_num` correspondences sampled with replacement;
  * augmentation: uniform [0, noise) jitter + random single-axis rotation
    (handled by `d3feat_tpu.data.batching`).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.data.batching import make_training_batch
from d3feat_tpu.data.ply import read_ply_points
from d3feat_tpu.ops.subsample import grid_subsample

TEST_SCENES = (
    '7-scenes-redkitchen',
    'sun3d-home_at-home_at_scan1_2013_jan_1',
    'sun3d-home_md-home_md_scan9_2012_sep_30',
    'sun3d-hotel_uc-scan3',
    'sun3d-hotel_umd-maryland_hotel1',
    'sun3d-hotel_umd-maryland_hotel3',
    'sun3d-mit_76_studyroom-76-1studyroom2',
    'sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika',
)

MAX_TRAIN_POINTS = 80000   # skip larger clouds (ThreeDMatch.py:218)
MIN_TRAIN_POINTS = 2000    # skip smaller clouds (ThreeDMatch.py:220)


class ThreeDMatchDataset:
    """Training/val pickles + official test fragments."""

    def __init__(self, root: str, voxel_size: float = 0.03,
                 load_test: bool = False,
                 scenes: Optional[Tuple[str, ...]] = None):
        self.root = root
        self.voxel_size = voxel_size
        # test-scene override (synthetic corpora, subsets); defaults to
        # the official 8 scenes (ThreeDMatch.py:326-340)
        self.scenes = tuple(scenes) if scenes else TEST_SCENES
        self.points: Dict[str, Dict[str, np.ndarray]] = {}
        self.corr: Dict[str, Dict[str, np.ndarray]] = {}
        self.pair_keys: Dict[str, List[str]] = {}
        if load_test:
            self.test_ids: List[str] = []
            self.test_points: List[np.ndarray] = []
            self._prepare_test()
        else:
            # tolerate a missing split like the reference
            # (`ThreeDMatch.py:117-119` prints and continues)
            for split in ('train', 'val'):
                try:
                    self._load_split(split)
                except FileNotFoundError:
                    self.pair_keys[split] = []
            if not any(self.pair_keys.values()):
                raise FileNotFoundError(
                    f'no 3DMatch training pickles under {root}; generate '
                    f'them with d3feat_tpu.data.overlap')

    # -- training ------------------------------------------------------------
    def _load_split(self, split: str) -> None:
        pts_file = os.path.join(
            self.root, f'3DMatch_{split}_{self.voxel_size:.3f}_points.pkl')
        kp_file = os.path.join(
            self.root, f'3DMatch_{split}_{self.voxel_size:.3f}_keypts.pkl')
        if not (os.path.exists(pts_file) and os.path.exists(kp_file)):
            raise FileNotFoundError(
                f'missing {pts_file} / {kp_file}; generate them with '
                f'd3feat_tpu.data.overlap (reference: datasets/cal_overlap.py)')
        with open(pts_file, 'rb') as fh:
            self.points[split] = {k: np.asarray(v, np.float32)
                                  for k, v in pickle.load(fh).items()}
        with open(kp_file, 'rb') as fh:
            self.corr[split] = {k: np.asarray(v)
                                for k, v in pickle.load(fh).items()}
        self.pair_keys[split] = sorted(self.corr[split].keys())

    def num_pairs(self, split: str) -> int:
        return len(self.pair_keys.get(split, ()))

    def sample_pair(self, split: str, rng: np.random.Generator
                    ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """One random (anc_points, pos_points, correspondences) or None if
        the sampled pair violates the size limits."""
        keys = self.pair_keys[split]
        key = keys[int(rng.integers(len(keys)))]
        anc_id, pos_id = key.split('@')
        anc = self.points[split][anc_id]
        pos = self.points[split][pos_id]
        if (len(anc) > MAX_TRAIN_POINTS or len(pos) > MAX_TRAIN_POINTS
                or len(anc) < MIN_TRAIN_POINTS or len(pos) < MIN_TRAIN_POINTS):
            return None
        return anc, pos, self.corr[split][key]

    def train_batches(self, config: Config, rng: np.random.Generator,
                      split: str = 'train') -> Iterator[Dict]:
        """Endless generator of training batches for the Trainer (empty
        when the split has no pairs, e.g. a missing val pickle)."""
        if not self.pair_keys.get(split):
            return
        consecutive_skips = 0
        while True:
            if consecutive_skips > 200:
                raise RuntimeError(
                    f'{consecutive_skips} consecutive pair skips on split '
                    f'{split!r}: every sampled pair violates the size '
                    f'limits or overflows the static capacities — raise '
                    f'config.max_points / capacity ratios')
            sampled = self.sample_pair(split, rng)
            if sampled is None:
                consecutive_skips += 1
                continue
            anc, pos, corr = sampled
            try:
                yield make_training_batch(anc, pos, corr, config, rng=rng,
                                          augment=(split == 'train'))
                consecutive_skips = 0
            except ValueError:
                consecutive_skips += 1  # capacity overflow: skip

    # -- test ----------------------------------------------------------------
    def _prepare_test(self) -> None:
        """Official test fragments, voxel-downsampled
        (`ThreeDMatch.py:326-368`)."""
        for scene in self.scenes:
            scene_dir = os.path.join(self.root, 'fragments', scene)
            if not os.path.isdir(scene_dir):
                raise FileNotFoundError(f'missing test scene {scene_dir}')
            plys = sorted(
                (f for f in os.listdir(scene_dir) if f.endswith('.ply')),
                key=lambda x: int(x[:-4].split('_')[-1]))
            for name in plys:
                pts = read_ply_points(os.path.join(scene_dir, name))
                pts = grid_subsample(pts, self.voxel_size)
                self.test_ids.append(f'{scene}/{name}')
                self.test_points.append(pts)

    def test_fragments(self) -> Iterator[Tuple[str, int, np.ndarray]]:
        """(scene, fragment_id, points) in the tester's expected order."""
        for frag_id, pts in zip(self.test_ids, self.test_points):
            scene = frag_id.split('/')[0]
            num = int(frag_id.split('_')[-1][:-4])
            yield scene, num, pts
