"""Tests for PLY I/O, dataset adapters (synthetic fixtures), overlap
generation, calibration, and the descriptor dump layout."""

import os
import pickle

import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.ply import read_ply, read_ply_points, write_ply
from d3feat_tpu.data.overlap import (compute_overlap_and_matches,
                                     generate_training_pairs)
from d3feat_tpu.data.calibration import calibrate, theoretical_limit
from d3feat_tpu.data.threedmatch import ThreeDMatchDataset


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.random((123, 3)).astype(np.float32)
    scores = rng.random(123).astype(np.float32)
    path = str(tmp_path / 'cloud.ply')
    write_ply(path, [pts, scores], ['x', 'y', 'z', 'score'])
    data = read_ply(path)
    np.testing.assert_allclose(
        np.stack([data['x'], data['y'], data['z']], 1), pts, rtol=1e-6)
    np.testing.assert_allclose(data['score'], scores, rtol=1e-6)
    np.testing.assert_allclose(read_ply_points(path), pts, rtol=1e-6)


def test_read_reference_demo_ply():
    path = '/root/reference/demo_data/cloud_bin_0.ply'
    if not os.path.exists(path):
        pytest.skip('demo data unavailable')
    pts = read_ply_points(path)
    assert pts.shape == (258342, 3)
    assert np.isfinite(pts).all()


def test_overlap_and_matches(rng):
    a = (rng.random((500, 3))).astype(np.float32)
    b = np.concatenate([a[:250] + 0.001, a[:250] + 10.0]).astype(np.float32)
    overlap, matches = compute_overlap_and_matches(a, b, 0.01)
    assert abs(overlap - 0.5) < 0.05
    assert np.all(matches[:, 0] < 250)


def test_generate_training_pairs_and_adapter(tmp_path, rng):
    """Overlap generation writes pickles the 3DMatch adapter can train on."""
    base = (rng.random((3000, 3)) * 2).astype(np.float32)
    # three overlapping fragments of one 'scene', each in its own frame
    frags, poses = {}, {}
    for i in range(3):
        sel = base[i * 800:i * 800 + 1800]
        t = np.eye(4)
        t[:3, 3] = [0.1 * i, 0, 0]
        inv = np.linalg.inv(t)
        frags[f'scene/frag_{i}'] = (sel @ inv[:3, :3].T + inv[:3, 3]
                                    ).astype(np.float32)
        poses[f'scene/frag_{i}'] = t

    pts_f, kp_f = generate_training_pairs(
        frags, poses, str(tmp_path), split='train', voxel_size=0.03)
    assert os.path.exists(pts_f) and os.path.exists(kp_f)
    with open(kp_f, 'rb') as fh:
        keypts = pickle.load(fh)
    assert len(keypts) >= 2  # adjacent fragments overlap

    ds = ThreeDMatchDataset(str(tmp_path), 0.03)
    assert ds.num_pairs('train') == len(keypts)
    cfg = threedmatch_config(
        max_points=4096, size_multiple=64, keypts_num=16,
        level_capacity_ratio=1.0, level_capacity_ratios=(),
        neighborhood_limits=(10, 10, 10, 10, 10))
    # 1800-pt fragments violate MIN_TRAIN_POINTS=2000 -> patch limit
    import d3feat_tpu.data.threedmatch as tdm
    old = tdm.MIN_TRAIN_POINTS
    tdm.MIN_TRAIN_POINTS = 100
    try:
        batch = next(ds.train_batches(cfg, rng))
    finally:
        tdm.MIN_TRAIN_POINTS = old
    assert batch['corr_valid'].sum() == 16
    assert batch['pyramid']['features'].shape[1] == 1


def test_missing_data_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ThreeDMatchDataset(str(tmp_path), 0.03)


def test_theoretical_limit_matches_reference_bound():
    # datasets/common.py:613: ceil(4/3*pi*(ratio+1)^3) at ratio=2.5 -> 180
    assert theoretical_limit(2.5) == int(np.ceil(4 / 3 * np.pi * 3.5 ** 3))


def test_calibrate_produces_valid_knobs(rng):
    clouds = [(rng.random((1500, 3)) * 1.5).astype(np.float32)
              for _ in range(3)]
    cfg = threedmatch_config(size_multiple=256)
    knobs = calibrate(clouds, cfg)
    assert len(knobs['neighborhood_limits']) == cfg.num_layers
    assert all(1 <= k <= 1024 for k in knobs['neighborhood_limits'])
    assert len(knobs['level_capacity_ratios']) == cfg.num_layers - 1
    assert all(0 < r <= 1.0 for r in knobs['level_capacity_ratios'])
    assert knobs['max_points'] % 256 == 0
    assert knobs['max_points'] >= 2 * 1500


@pytest.mark.slow
def test_extract_many_matches_single(rng):
    """Batched extraction (B same-bucket fragments per dispatch) is
    numerically identical to per-fragment extract in f32 — each cloud is
    an independent segment end-to-end (VERDICT r3 #3)."""
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.data.batching import make_test_batch
    from d3feat_tpu.runtime import DescriptorExtractor

    cfg = threedmatch_config(
        max_points=512, size_multiple=64, first_features_dim=8,
        out_features_dim=8, level_capacity_ratio=1.0,
        level_capacity_ratios=(), neighborhood_limits=(8, 8, 8, 8, 8),
        compute_dtype='float32', score_dtype='float32')
    # three fragments in the 512 bucket (one group of 2 + a padded tail
    # chunk) and one in the 64 bucket (exercises bucket grouping)
    frags = [(rng.random((300, 3))).astype(np.float32),
             (rng.random((420, 3)) * 1.2).astype(np.float32),
             (rng.random((280, 3)) + 0.3).astype(np.float32),
             (rng.random((50, 3))).astype(np.float32)]
    batch = make_test_batch(frags[0], cfg)
    _, variables = init_kpfcnn(cfg, batch['pyramid'])
    ex = DescriptorExtractor(cfg, variables)
    singles = [ex.extract(p) for p in frags]
    batched = ex.extract_many(frags, batch=2)
    for (d1, s1), (d2, s2) in zip(singles, batched):
        np.testing.assert_allclose(d2, d1, rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(s2, s1, rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_descriptor_dump_layout(tmp_path, rng):
    """generate_descriptors writes the reference tester's exact layout
    (utils/tester.py:177-233), score-ascending."""
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.data.batching import make_test_batch
    from d3feat_tpu.runtime import DescriptorExtractor, generate_descriptors

    cfg = threedmatch_config(
        max_points=512, size_multiple=64, first_features_dim=8,
        out_features_dim=8, level_capacity_ratio=1.0,
        level_capacity_ratios=(), neighborhood_limits=(8, 8, 8, 8, 8))
    pts = (rng.random((300, 3))).astype(np.float32)
    batch = make_test_batch(pts, cfg)
    _, variables = init_kpfcnn(cfg, batch['pyramid'])
    ex = DescriptorExtractor(cfg, variables)
    frags = [('sceneA', 0, pts), ('sceneA', 1, pts[:250])]
    out = generate_descriptors(ex, frags, str(tmp_path), 'unit')

    for num, n_pts in ((0, 300), (1, 250)):
        d = np.load(os.path.join(out, 'descriptors', 'sceneA',
                                 f'cloud_bin_{num}.D3Feat.npy'))
        k = np.load(os.path.join(out, 'keypoints', 'sceneA',
                                 f'cloud_bin_{num}.npy'))
        s = np.load(os.path.join(out, 'scores', 'sceneA',
                                 f'cloud_bin_{num}.npy'))
        assert d.shape == (n_pts, 8)
        assert k.shape == (n_pts, 3)
        assert s.shape == (n_pts,)
        assert np.all(np.diff(s) >= 0)  # ascending scores
        # keypoints are a permutation of the input points
        assert set(map(tuple, np.round(k, 5))) == set(
            map(tuple, np.round(pts[:n_pts], 5)))

    # the dump self-describes its numeric identity (pyramid path +
    # dtypes) so cross-path comparisons can be refused mechanically
    from d3feat_tpu.runtime.tester import read_dump_meta
    meta = read_dump_meta(out)
    assert meta == {'pyramid': 'host',
                    'compute_dtype': cfg.compute_dtype,
                    'score_dtype': cfg.score_dtype,
                    'batch_program': False}
