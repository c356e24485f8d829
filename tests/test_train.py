"""Training-loop tests: train step runs, loss decreases, checkpoint
round-trip, optimizer parity pieces."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.batching import make_test_batch, make_training_batch
from d3feat_tpu.models import init_kpfcnn
from d3feat_tpu.train.trainer import (clip_by_per_variable_norm,
                                      create_train_state, make_eval_step,
                                      make_forward, make_train_step,
                                      weight_l2)
import pytest

from d3feat_tpu.utils.checkpoint import (latest_snapshot, restore_checkpoint,
                                         save_checkpoint)


def tiny_cfg(**kw):
    base = dict(
        max_points=1024,
        size_multiple=64,
        level_capacity_ratio=1.0, level_capacity_ratios=(),
        first_features_dim=8,
        out_features_dim=8,
        neighborhood_limits=(10, 10, 10, 10, 10),
        keypts_num=32,
        epoch_steps=10,
    )
    base.update(kw)
    return threedmatch_config(**base)


def synthetic_pair(rng, n=300):
    """Anchor cloud + rigidly moved copy; correspondences are identity."""
    anc = (rng.random((n, 3)) * 2.0).astype(np.float32)
    theta = 0.4
    c, s = np.cos(theta), np.sin(theta)
    r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    pos = anc @ r
    corr = np.stack([np.arange(n), np.arange(n)], axis=1)
    return anc, pos, corr


# Shared across this module's slow tests: one compiled train step + one
# model init (jit caching is per-closure, so sharing the closures is what
# actually removes the recompiles).
@pytest.fixture(scope='module')
def shared():
    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    anc, pos, corr = synthetic_pair(rng)
    batch = make_training_batch(anc, pos, corr, cfg, rng=rng, augment=False)
    _, variables = init_kpfcnn(cfg, batch['pyramid'])
    return {
        'cfg': cfg, 'batch': batch, 'variables': variables,
        'step': make_train_step(cfg),
    }


@pytest.mark.slow
def test_train_step_decreases_loss(shared):
    cfg, batch = shared['cfg'], shared['batch']
    state = create_train_state(cfg, shared['variables'])
    step = shared['step']

    state, m0 = step(state, batch)
    losses = [float(m0['total'])]
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m['total']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 9
    # accuracy is a valid fraction
    assert 0.0 <= float(m['accuracy']) <= 1.0


@pytest.mark.slow
def test_batch_stats_update(shared):
    cfg, batch = shared['cfg'], shared['batch']
    state = create_train_state(cfg, shared['variables'])
    step = shared['step']
    new_state, _ = step(state, batch)
    before = jax.tree.leaves(state.batch_stats)
    after = jax.tree.leaves(new_state.batch_stats)
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed


@pytest.mark.slow
def test_eval_step_and_forward(shared):
    cfg, batch = shared['cfg'], shared['batch']
    variables = shared['variables']
    state = create_train_state(cfg, variables)
    anc, _, _ = synthetic_pair(np.random.default_rng(0))
    metrics = make_eval_step(cfg)(state, batch)
    assert np.isfinite(float(metrics['loss']))
    fwd = make_forward(cfg)
    desc, score = fwd(variables, make_test_batch(anc, cfg.replace(
        max_points=512))['pyramid'])
    assert np.isfinite(np.asarray(desc)).all()


def test_lr_schedule_epoch_decay():
    cfg = tiny_cfg(learning_rate=0.1, epoch_steps=10)
    from d3feat_tpu.train.trainer import make_optimizer
    del make_optimizer  # schedule is internal; test observable decay instead
    # lr at step 0 vs step epoch_steps must differ by lr_decay
    from d3feat_tpu.train import trainer as tr
    tx = tr.make_optimizer(cfg)
    params = {'w': jnp.ones(3)}
    opt_state = tx.init(params)
    g = {'w': jnp.ones(3)}
    # first step of epoch 0
    up0, opt_state = tx.update(g, opt_state, params)
    # advance trace state to a later epoch by faking many updates
    for _ in range(10):
        up, opt_state = tx.update(g, opt_state, params)
    # momentum accumulates: v_k = sum m^i; lr decays by lr_decay each epoch
    # check update magnitude at epoch 1 reflects decayed lr / accumulated v
    v0 = float(-up0['w'][0]) / 0.1  # = 1 (fresh trace)
    assert abs(v0 - 1.0) < 1e-6
    expected_lr = 0.1 * cfg.lr_decay  # epoch 1 (11th update, count=10)
    v11 = sum(0.98 ** i for i in range(11))
    np.testing.assert_allclose(float(-up['w'][0]), expected_lr * v11,
                               rtol=1e-5)


def test_per_variable_clip():
    clip = clip_by_per_variable_norm(1.0)
    g = {'a': jnp.array([3.0, 4.0]), 'b': jnp.array([0.1, 0.0])}
    out, _ = clip.update(g, clip.init(g))
    np.testing.assert_allclose(np.linalg.norm(out['a']), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out['b'], g['b'], rtol=1e-6)  # under norm


def test_weight_l2_selects_weights_only():
    params = {'block': {'weights': jnp.ones((2, 2)),
                        'gamma': jnp.ones(4) * 10}}
    assert float(weight_l2(params)) == 2.0  # 0.5 * 4 ones


@pytest.mark.slow
def test_checkpoint_roundtrip(shared, tmp_path):
    cfg, batch = shared['cfg'], shared['batch']
    variables = shared['variables']
    state = create_train_state(cfg, variables)
    step = shared['step']
    state, _ = step(state, batch)

    path = os.path.join(tmp_path, 'snap-0')
    save_checkpoint(path, state)
    template = create_train_state(cfg, variables)
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert latest_snapshot(str(tmp_path)) == path


def test_spike_guard_zeroes_only_outliers_and_keeps_opt_state_shape():
    """spike_guard: spiked grads are zeroed before the optimizer (so they
    add nothing to momentum), normal grads pass through bit-identically,
    and the opt_state pytree is IDENTICAL with the guard on or off (so
    snapshots restore across the setting)."""
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.train.trainer import make_optimizer, spike_guard
    cfg_on = threedmatch_config(grad_skip_threshold=4.0, epoch_steps=10)
    cfg_off = threedmatch_config(grad_skip_threshold=0.0, epoch_steps=10)
    grads = {'w': jnp.full((4,), 0.1)}
    g1, gn, skipped = spike_guard(grads, cfg_on)
    assert float(skipped) == 0.0
    np.testing.assert_array_equal(np.asarray(g1['w']),
                                  np.asarray(grads['w']))
    assert abs(float(gn) - 0.2) < 1e-6
    spike = {'w': jnp.full((4,), 1e6)}
    g2, gn2, skipped2 = spike_guard(spike, cfg_on)
    assert float(skipped2) == 1.0 and float(np.abs(g2['w']).sum()) == 0.0
    # guard off: spike passes through untouched (clip happens downstream)
    g3, _, skipped3 = spike_guard(spike, cfg_off)
    assert float(skipped3) == 0.0 and float(np.abs(g3['w']).sum()) > 0
    # optimizer state structure must not depend on the setting
    params = {'w': jnp.ones((4,))}
    s_on = jax.tree_util.tree_structure(make_optimizer(cfg_on).init(params))
    s_off = jax.tree_util.tree_structure(
        make_optimizer(cfg_off).init(params))
    assert s_on == s_off


def test_grad_global_clip_scales_instead_of_skipping():
    """grad_global_clip: over-norm grads keep their direction at a bounded
    magnitude (the r3 lr-0.02 run skipped 67% of its updates and froze);
    the raw gnorm is still reported and the skip backstop fires only far
    above the clip."""
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.train.trainer import spike_guard
    cfg = threedmatch_config(grad_skip_threshold=20.0,
                             grad_global_clip=0.5, epoch_steps=10)
    # norm 0.2 < clip: untouched
    small = {'w': jnp.full((4,), 0.1)}
    g, gn, sk = spike_guard(small, cfg)
    np.testing.assert_array_equal(np.asarray(g['w']), np.asarray(small['w']))
    assert float(sk) == 0.0
    # norm 2.0 > clip 0.5: scaled to exactly the clip, not zeroed
    big = {'w': jnp.full((4,), 1.0)}
    g2, gn2, sk2 = spike_guard(big, cfg)
    assert abs(float(gn2) - 2.0) < 1e-6          # raw norm reported
    assert abs(float(jnp.linalg.norm(g2['w'])) - 0.5) < 1e-6
    assert float(sk2) == 0.0
    np.testing.assert_allclose(np.asarray(g2['w']), 0.25 * np.ones(4),
                               rtol=1e-6)
    # far above the skip backstop: zeroed
    huge = {'w': jnp.full((4,), 100.0)}
    g3, _, sk3 = spike_guard(huge, cfg)
    assert float(sk3) == 1.0 and float(np.abs(g3['w']).sum()) == 0.0
    # parameters.txt round-trip keeps the new field
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, 'parameters.txt')
        cfg.save(p)
        assert type(cfg).load(p).grad_global_clip == 0.5


def test_rescale_kpoints_matches_fresh_init_at_target_geometry():
    """Opt-in --rescale-kpoints DEVIATION (cross-geometry restore):
    dispositions are checkpointed in PHYSICAL units — same as the
    reference, whose Saver restores the trained-scale kernel_points
    variable verbatim (tester.py:143-162; reference parity is therefore
    NO rescale).  When the deviation is enabled, the rescale must land
    exactly where a fresh init at the target geometry would:
    load_kernel_points is linear in radius (normalize -> *radius,
    orthonormal seeded rotation, jitter sigma = radius*0.01), so the
    rescaled tree must be bit-close to a fresh init at the target
    radius."""
    from d3feat_tpu.config import threedmatch_config
    from d3feat_tpu.ops.kernel_points import load_kernel_points
    from d3feat_tpu.utils.checkpoint import rescale_kpoints

    trained = threedmatch_config()                      # dl 0.025, ext 1.0
    target = trained.replace(first_subsampling_dl=0.05, KP_extent=2.0)

    kpoints = {}
    expect = {}
    for level in range(trained.num_layers):
        r_tr = 1.5 * trained.KP_extent * trained.first_subsampling_dl \
            * 2 ** level
        r_tg = 1.5 * target.KP_extent * target.first_subsampling_dl \
            * 2 ** level
        kpoints[f'level{level}'] = jnp.asarray(load_kernel_points(
            r_tr, trained.num_kernel_points, seed=trained.kernel_seed + level))
        expect[f'level{level}'] = load_kernel_points(
            r_tg, target.num_kernel_points, seed=target.kernel_seed + level)

    out = rescale_kpoints(kpoints, trained, target)
    for level in kpoints:
        np.testing.assert_allclose(np.asarray(out[level]), expect[level],
                                   rtol=2e-6, atol=1e-7)

    # identity geometry: the tree must pass through untouched (is-check —
    # resident restore relies on no-op cheapness)
    assert rescale_kpoints(kpoints, trained, trained) is kpoints
