"""Data-parallel training on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.batching import make_training_batch
from d3feat_tpu.models import init_kpfcnn
from d3feat_tpu.parallel import (make_dp_train_step, make_mesh, stack_batches)
from d3feat_tpu.train.trainer import create_train_state, make_train_step


def tiny_cfg():
    return threedmatch_config(
        max_points=512, size_multiple=64, level_capacity_ratio=1.0, level_capacity_ratios=(),
        first_features_dim=8, out_features_dim=8,
        neighborhood_limits=(8, 8, 8, 8, 8), keypts_num=16)


def make_pair_batch(rng, cfg, n=150):
    anc = (rng.random((n, 3)) * 2.0).astype(np.float32)
    pos = anc + 0.001
    corr = np.stack([np.arange(n), np.arange(n)], axis=1)
    return make_training_batch(anc, pos, corr, cfg, rng=rng, augment=False)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)


@pytest.mark.slow
def test_dp_step_runs_and_matches_singles(rng):
    """DP loss over 8 pairs == mean of 8 single-pair losses."""
    cfg = tiny_cfg()
    batches = [make_pair_batch(rng, cfg) for _ in range(8)]
    _, variables = init_kpfcnn(cfg, batches[0]['pyramid'])
    state = create_train_state(cfg, variables)

    mesh = make_mesh(8)
    dp_step = make_dp_train_step(cfg, mesh)
    stacked = stack_batches(batches)
    new_state, metrics = dp_step(state, stacked)
    assert np.isfinite(float(metrics['total']))

    # single-device reference: mean of per-pair losses
    single = make_train_step(cfg)
    singles = []
    for b in batches:
        _, m = single(state, b)
        singles.append(float(m['loss']))
    np.testing.assert_allclose(float(metrics['desc_loss'])
                               + float(metrics['det_loss']),
                               np.mean(singles), rtol=1e-4)

    # params actually moved
    moved = any(
        not np.allclose(a, b)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(new_state.params)))
    assert moved


@pytest.mark.slow
def test_dp_grads_replicated(rng):
    """After a DP step, params stay replicated (identical on all devices)."""
    cfg = tiny_cfg()
    batches = [make_pair_batch(rng, cfg) for _ in range(8)]
    _, variables = init_kpfcnn(cfg, batches[0]['pyramid'])
    state = create_train_state(cfg, variables)
    mesh = make_mesh(8)
    dp_step = make_dp_train_step(cfg, mesh)
    new_state, _ = dp_step(state, stack_batches(batches))
    leaf = jax.tree.leaves(new_state.params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
