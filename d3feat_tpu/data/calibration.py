"""Offline calibration of the static-shape knobs.

Replaces the reference's *runtime* calibration passes with an offline tool
whose outputs are plain config values:

  * neighbor-degree limits K_l — the reference spins a throwaway session
    and histograms in-radius neighbor counts until `keep_ratio` of
    neighborhoods are covered (`datasets/common.py:572-673`, upper bound
    ceil(4/3*pi*(ratio+1)^3) at `:613`);
  * batch/point capacity — the reference's stochastic batch-limit
    controller (`datasets/common.py:509-570`) chooses a stacked-point cap
    giving the target pairs-per-step; here `max_points` is the chosen
    percentile of stacked pair sizes;
  * per-level capacity ratios — measured worst-case |level l+1| / |level l|
    after 2x voxel subsampling (+ safety margin).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.ops.neighbors import neighbor_histogram_limit
from d3feat_tpu.ops.subsample import grid_subsample


def theoretical_limit(radius_ratio: float) -> int:
    """Reference upper bound on neighbor counts: a radius-r ball of
    dl-spaced points holds at most ~4/3*pi*(r/dl + 1)^3
    (`datasets/common.py:613,710`)."""
    return int(np.ceil(4.0 / 3.0 * np.pi * (radius_ratio + 1.0) ** 3))


def calibrate(
    sample_clouds: Sequence[np.ndarray],
    config: Config,
    keep_ratio: float = 0.8,
    size_percentile: float = 0.9,
    capacity_margin: float = 1.3,
) -> Dict[str, tuple]:
    """Compute static-shape knobs from sample clouds (already voxelized at
    config.first_subsampling_dl). Returns a dict of config overrides:
    neighborhood_limits, level_capacity_ratios, max_points.
    """
    num_layers = config.num_layers
    r = config.first_subsampling_dl * config.KP_extent * 2.5
    dl = config.first_subsampling_dl

    clouds = [np.asarray(c, np.float32) for c in sample_clouds]
    limits: List[int] = []
    ratios: List[float] = []
    for l in range(num_layers):
        bound = theoretical_limit(r / dl)
        k = min(neighbor_histogram_limit(clouds, r, keep_ratio), bound)
        limits.append(int(k))
        if l < num_layers - 1:
            next_clouds = [grid_subsample(c, 2.0 * dl) for c in clouds]
            worst = max(len(n) / max(len(c), 1)
                        for n, c in zip(next_clouds, clouds))
            ratios.append(round(min(worst * capacity_margin, 1.0), 3))
            clouds = next_clouds
        r *= 2.0
        dl *= 2.0

    # stacked-pair size cap at the chosen percentile (pairs ~ 2x one cloud)
    sizes = sorted(2 * len(c) for c in sample_clouds)
    cap = sizes[min(int(size_percentile * len(sizes)), len(sizes) - 1)]
    m = config.size_multiple
    max_points = int(-(-cap // m) * m)

    return {
        'neighborhood_limits': tuple(limits),
        'level_capacity_ratios': tuple(ratios),
        'max_points': max_points,
    }
