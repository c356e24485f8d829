"""Tests for profiling utilities and the NaN-debug trainer mode."""

import os

import numpy as np
import pytest

from d3feat_tpu.utils.profiling import AverageMeter, Timer, device_timer


def test_average_meter():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0
    assert m.count == 3
    assert abs(m.std - np.std([1, 2, 3])) < 1e-9


def test_timer():
    t = Timer()
    t.tic()
    t.toc()
    t.tic()
    t.toc()
    assert t.calls == 2
    assert t.total_time >= 0


def test_device_timer_records():
    out = []
    with device_timer(out):
        pass
    assert len(out) == 1 and out[0] >= 0


@pytest.mark.slow
def test_nan_debug_dump(tmp_path, rng):
    """Trainer with debug_nan dumps a report and raises on non-finite loss."""
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.data.batching import make_training_batch
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.train.trainer import Trainer, create_train_state

    cfg = threedmatch_config(
        max_points=512, size_multiple=64, level_capacity_ratio=1.0,
        level_capacity_ratios=(), first_features_dim=8, out_features_dim=8,
        neighborhood_limits=(8, 8, 8, 8, 8), keypts_num=16, epoch_steps=2)
    n = 150
    anc = (rng.random((n, 3)) * 2).astype(np.float32)
    corr = np.stack([np.arange(n)] * 2, 1)
    batch = make_training_batch(anc, anc + 0.001, corr, cfg, rng=rng,
                                augment=False)
    _, variables = init_kpfcnn(cfg, batch['pyramid'])
    # poison one weight to force a NaN through the forward pass
    import jax
    leaves, treedef = jax.tree.flatten(variables['params'])
    leaves[0] = np.asarray(leaves[0]) * np.nan
    variables = dict(variables, params=jax.tree.unflatten(treedef, leaves))
    state = create_train_state(cfg, variables)
    trainer = Trainer(cfg, str(tmp_path), debug_nan=True)
    with pytest.raises(FloatingPointError):
        trainer.train(state, train_batches=lambda: iter([batch, batch]),
                      num_epochs=1)
    report = os.path.join(tmp_path, 'nan_debug', 'report.txt')
    assert os.path.exists(report)
    assert 'non-finite loss' in open(report).read()
    assert os.path.exists(os.path.join(tmp_path, 'nan_debug', 'batch.npz'))
