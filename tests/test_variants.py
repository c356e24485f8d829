"""Config-variant coverage: loss types, influence/aggregation modes, ETH
adapter, extractor bucketing + overflow retry."""

import os

import numpy as np
import pytest

from d3feat_tpu.config import eth_test_config, threedmatch_config
from d3feat_tpu.data.batching import make_training_batch
from d3feat_tpu.models import init_kpfcnn
from d3feat_tpu.train.trainer import create_train_state, make_train_step


def tiny_cfg(**kw):
    base = dict(
        max_points=512, size_multiple=64, level_capacity_ratio=1.0,
        level_capacity_ratios=(), first_features_dim=8, out_features_dim=8,
        neighborhood_limits=(8, 8, 8, 8, 8), keypts_num=16)
    base.update(kw)
    return threedmatch_config(**base)


def one_batch(rng, cfg, n=150):
    anc = (rng.random((n, 3)) * 2).astype(np.float32)
    corr = np.stack([np.arange(n)] * 2, 1)
    return make_training_batch(anc, anc + 0.001, corr, cfg, rng=rng,
                               augment=False)


@pytest.mark.parametrize('variant', [
    dict(loss_type='contrastive'),
    dict(convolution_mode='closest'),
    dict(KP_influence='gaussian'),
    dict(KP_influence='constant'),
    dict(det_loss_weight=0.0),
])
@pytest.mark.slow
def test_variant_train_step(rng, variant):
    cfg = tiny_cfg(**variant)
    batch = one_batch(rng, cfg)
    _, variables = init_kpfcnn(cfg, batch['pyramid'])
    state = create_train_state(cfg, variables)
    state, metrics = make_train_step(cfg)(state, batch)
    assert np.isfinite(float(metrics['total'])), variant
    if variant.get('det_loss_weight') == 0.0:
        assert float(metrics['det_loss']) == 0.0


def test_eth_adapter_and_config(tmp_path, rng):
    from d3feat_tpu.data.eth import ETH_SCENES, ETHDataset
    from d3feat_tpu.data.ply import write_ply
    for scene in ETH_SCENES:
        d = tmp_path / scene
        os.makedirs(d)
        for i in range(2):
            pts = (rng.random((500, 3)) * 5).astype(np.float32)
            write_ply(str(d / f'Hokuyo_{i}.ply'), [pts], ['x', 'y', 'z'])
    ds = ETHDataset(str(tmp_path), voxel_size=0.0625)
    frags = list(ds.test_fragments())
    assert len(frags) == 8
    scene, num, pts = frags[0]
    assert scene == ETH_SCENES[0] and num == 0
    assert pts.shape[1] == 3

    cfg = eth_test_config()
    assert cfg.first_subsampling_dl == 0.05
    assert cfg.KP_extent == 2.0


@pytest.mark.slow
def test_extractor_bucketing_and_retry(rng):
    from d3feat_tpu.runtime.tester import DescriptorExtractor, _bucket
    assert _bucket(100, 64) == 128
    assert _bucket(64, 64) == 64
    assert _bucket(129, 64) == 256

    from d3feat_tpu.models.kpfcnn import init_variables
    # tight ratios that a uniform cloud will overflow -> retry path
    cfg = tiny_cfg(level_capacity_ratios=(0.05, 0.05, 0.05, 0.05),
                   max_points=512)
    variables = init_variables(cfg)
    ex = DescriptorExtractor(cfg, variables)
    pts = (rng.random((300, 3)) * 2).astype(np.float32)
    desc, score = ex.extract(pts)  # must fall back, not raise
    assert desc.shape == (300, cfg.out_features_dim)
    assert np.isfinite(desc).all()
    # second call reuses the cached program (same bucket)
    desc2, _ = ex.extract(pts)
    np.testing.assert_allclose(desc, desc2, atol=1e-6)
