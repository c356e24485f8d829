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


@pytest.mark.slow
def test_resident_dp_matches_dp(rng):
    """Resident-DP (dataset sharded across device HBM, local pair slicing,
    pmean grads) computes the same update as the stacked-batch DP step
    given the same pairs + augmentation."""
    from d3feat_tpu.data.cache import PairPyramidCache
    from d3feat_tpu.parallel.data_parallel import (
        make_dp_train_step, make_mesh, make_resident_dp_train_step,
        shard_resident, stack_batches)
    from test_train import synthetic_pair, tiny_cfg

    n_dev = 4
    # f32 compute: this is an IMPLEMENTATION-equivalence test (shard_map
    # + pmean vs vmap + mean), so isolate it from compute-dtype noise —
    # since ae02595 the bf16 casts are explicit in the program, and on
    # the CPU test platform (no MXU implicit rounding before) the two
    # differently-compiled programs produce bf16-scale GRADIENT noise
    # (losses still bit-match) that swamped the 2e-3 update tolerance.
    cfg = tiny_cfg(compute_dtype='float32')
    cache = PairPyramidCache(cfg)
    base_rng = np.random.default_rng(0)
    for i in range(n_dev):
        anc, pos, corr = synthetic_pair(np.random.default_rng(i), n=250)
        cache.add_pair(anc, pos, corr)

    mesh = make_mesh(n_dev)
    resident = shard_resident(cache.stacked_pyramids(), mesh)

    # device d must see ITS pair: shard d holds global pair d; sample
    # until the pair matches, then make the index local to the 1-pair shard
    smalls = []
    for d in range(n_dev):
        r = np.random.default_rng(100 + d)
        # force pair d then make it local
        while True:
            s = cache.sample_small_batch(r)
            if int(s['pair_idx']) == d:
                break
        s['pair_idx'] = np.int32(0)
        smalls.append((d, s))

    small_stacked = jax.tree.map(lambda *xs: np.stack(xs),
                                 *[s for _, s in smalls])

    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    from d3feat_tpu.train.trainer import create_train_state
    state = create_train_state(cfg, variables)

    rstep = make_resident_dp_train_step(cfg, mesh)
    new_state, metrics = rstep(state, resident, small_stacked)
    assert np.isfinite(float(metrics['total']))

    # equivalent stacked-batch DP
    batches = []
    for d, s in smalls:
        pyr = dict(cache._pairs[d]['pyramid'])
        pyr['aug_rot'] = s['aug_rot']
        pyr['aug_key'] = s['aug_key']
        batches.append({'pyramid': pyr, 'anc_inds': s['anc_inds'],
                        'pos_inds': s['pos_inds'],
                        'corr_valid': s['corr_valid'],
                        'keypts_dists': s['keypts_dists']})
    dp_step = make_dp_train_step(cfg, mesh)
    new_state2, metrics2 = dp_step(state, stack_batches(batches))
    np.testing.assert_allclose(float(metrics['total']),
                               float(metrics2['total']), rtol=1e-5)
    # pmean-inside-shard_map vs vmap+mean reduce in different orders;
    # updates match to f32 reduction noise
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(new_state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_resident_dp_loop_end_to_end(rng, tmp_path):
    """run_resident_training on a 4-device mesh: pads the pool to the
    device count, shards it across HBM, rotates shards, trains with the
    pmean step, snapshots — and the snapshot restores into the
    single-device path (VERDICT r2 item 3)."""
    from d3feat_tpu.data.cache import PairPyramidCache
    from d3feat_tpu.train.resident import run_resident_training
    from d3feat_tpu.train.trainer import create_train_state
    from d3feat_tpu.utils.checkpoint import restore_checkpoint
    from test_train import synthetic_pair, tiny_cfg

    n_dev = 4
    cfg = tiny_cfg(epoch_steps=2)
    cache = PairPyramidCache(cfg)
    for i in range(6):   # 6 pairs -> 2 shards of 3 -> padded to 4 each
        anc, pos, corr = synthetic_pair(np.random.default_rng(i), n=250)
        cache.add_pair(anc, pos, corr)
    shards = cache.split_shards(2, np.random.default_rng(0))
    mesh = make_mesh(n_dev)

    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    save = str(tmp_path / 'dp_run')
    run_resident_training(cfg, shards, state, save,
                          rng=np.random.default_rng(1), epochs=4,
                          shard_epochs=1, mesh=mesh)
    assert all(len(s) == 4 for s in shards)      # padded to the mesh
    log = (tmp_path / 'dp_run' / 'training.txt').read_text()
    assert 'rotating resident pool shard' in log

    # the DP snapshot restores into a fresh single-device state
    state2 = create_train_state(cfg, variables)
    restored = restore_checkpoint(str(tmp_path / 'dp_run' / 'snap-3'),
                                  state2)
    assert int(restored.step) == 8               # 4 epochs x 2 steps
    for leaf in jax.tree.leaves(restored.params):
        assert np.isfinite(np.asarray(leaf)).all()
