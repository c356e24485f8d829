"""ETH dataset adapter (zero-shot generalization test).

Re-implementation of `datasets/ETH.py` (reference): four outdoor laser
scenes, test only, voxelized at 0.0625 m; a 3DMatch-trained model is
evaluated with rescaled geometry (`test_eth.py:37-39` — see
`d3feat_tpu.config.eth_test_config`).
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

import numpy as np

from d3feat_tpu.data.ply import read_ply_points
from d3feat_tpu.ops.subsample import grid_subsample

ETH_SCENES = ('gazebo_summer', 'gazebo_winter', 'wood_autmn', 'wood_summer')


class ETHDataset:
    def __init__(self, root: str, voxel_size: float = 0.0625):
        self.root = root
        self.voxel_size = voxel_size
        self.test_ids: List[str] = []
        self.test_points: List[np.ndarray] = []
        for scene in ETH_SCENES:
            scene_dir = os.path.join(root, scene)
            if not os.path.isdir(scene_dir):
                raise FileNotFoundError(f'missing ETH scene {scene_dir}')
            plys = sorted(
                (f for f in os.listdir(scene_dir) if f.endswith('.ply')),
                key=lambda x: int(x[:-4].split('_')[-1]))
            for name in plys:
                pts = read_ply_points(os.path.join(scene_dir, name))
                self.test_ids.append(f'{scene}/{name}')
                self.test_points.append(grid_subsample(pts, voxel_size))

    def test_fragments(self) -> Iterator[Tuple[str, int, np.ndarray]]:
        for frag_id, pts in zip(self.test_ids, self.test_points):
            scene = frag_id.split('/')[0]
            num = int(frag_id.split('_')[-1][:-4])
            yield scene, num, pts
