"""Reproducibility: seeded init + seeded data => identical results."""

import jax
import numpy as np

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.batching import make_training_batch
from d3feat_tpu.models import KPFCNN, init_kpfcnn
import pytest


def tiny_cfg():
    return threedmatch_config(
        max_points=512, size_multiple=64, level_capacity_ratio=1.0,
        level_capacity_ratios=(), first_features_dim=8, out_features_dim=8,
        neighborhood_limits=(8, 8, 8, 8, 8), keypts_num=16,
        compute_dtype='float32')


@pytest.mark.slow
def test_seeded_init_is_deterministic():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    anc = (rng.random((150, 3)) * 2).astype(np.float32)
    corr = np.stack([np.arange(150)] * 2, 1)
    batch = make_training_batch(anc, anc + 0.001, corr, cfg,
                                rng=np.random.default_rng(1), augment=False)
    _, v1 = init_kpfcnn(cfg, batch['pyramid'], seed=5)
    _, v2 = init_kpfcnn(cfg, batch['pyramid'], seed=5)
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # kernel points are seeded by config, not the init key
    _, v3 = init_kpfcnn(cfg, batch['pyramid'], seed=6)
    np.testing.assert_array_equal(
        np.asarray(v1['kpoints']['level0']),
        np.asarray(v3['kpoints']['level0']))


@pytest.mark.slow
def test_seeded_batch_and_forward_deterministic():
    cfg = tiny_cfg()
    base = np.random.default_rng(0).random((150, 3)).astype(np.float32) * 2
    corr = np.stack([np.arange(150)] * 2, 1)
    b1 = make_training_batch(base, base, corr, cfg,
                             rng=np.random.default_rng(9), augment=True)
    b2 = make_training_batch(base, base, corr, cfg,
                             rng=np.random.default_rng(9), augment=True)
    for a, b in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    _, variables = init_kpfcnn(cfg, b1['pyramid'], seed=0)
    model = KPFCNN(cfg)
    d1, s1 = model.apply(variables, b1['pyramid'], training=False)
    d2, s2 = model.apply(variables, b2['pyramid'], training=False)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
