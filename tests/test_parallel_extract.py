"""Mesh-DP extraction == single-device extraction, per fragment.

Runs on the conftest's virtual 8-device CPU mesh.
"""

import jax
import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.pyramid import build_pyramid
from d3feat_tpu.models import init_kpfcnn
from d3feat_tpu.parallel import make_dp_extract, make_mesh, pad_fragments
from d3feat_tpu.runtime import DescriptorExtractor
from d3feat_tpu.ops.subsample import grid_subsample


def make_fragment(seed, n_raw=6000, extent=1.5):
    rng = np.random.default_rng(seed)
    uv = rng.random((n_raw, 2)) * extent
    z = np.sin(uv[:, 0] * 2.1) * 0.3 + np.cos(uv[:, 1] * 1.7) * 0.2
    pts = np.stack([uv[:, 0], uv[:, 1], z], 1).astype(np.float32)
    return grid_subsample(pts, 0.03)


@pytest.mark.slow
def test_dp_extract_matches_single_device():
    mesh = make_mesh(8)
    frags = [make_fragment(s) for s in range(8)]
    cap = 1024 * max(-(-f.shape[0] // 1024) for f in frags)
    cfg = threedmatch_config(size_multiple=1024, max_points=cap,
                            compute_dtype='float32')
    pts, ns = pad_fragments(frags, cap)

    hp = build_pyramid(frags[0], [frags[0].shape[0]], cfg)
    _, variables = init_kpfcnn(cfg, hp)

    run = make_dp_extract(cfg, mesh)
    desc, score, ok = run(variables, pts, ns)
    desc, score, ok = map(np.asarray, (desc, score, ok))
    assert ok.all()

    single = DescriptorExtractor(cfg, variables, device_pyramid=True)
    for i, f in enumerate(frags):
        d_i, s_i = single.extract(f)
        n = f.shape[0]
        np.testing.assert_allclose(desc[i, :n], d_i, atol=2e-5)
        np.testing.assert_allclose(score[i, :n], s_i, atol=2e-5)
