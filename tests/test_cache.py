"""Cached-pyramid training path: on-device augmentation equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from d3feat_tpu.config import threedmatch_config
from d3feat_tpu.data.augment import random_rotate
from d3feat_tpu.data.batching import make_training_batch
from d3feat_tpu.data.cache import PairPyramidCache
from d3feat_tpu.models import init_kpfcnn
from d3feat_tpu.models.kpfcnn import KPFCNN
from d3feat_tpu.ops.kpconv import influence_weights_from_rel
from d3feat_tpu.train.trainer import create_train_state, make_train_step

from test_train import synthetic_pair, tiny_cfg


def test_rel_rotation_equivalence(rng):
    """rot= on the op == rotating the rel vectors on the host."""
    n, k = 50, 8
    rel = rng.integers(-30000, 30000, (n, k, 3)).astype(np.int16)
    inds = rng.integers(0, n + 1, (n, k)).astype(np.int32)
    kpts = rng.standard_normal((7, 3)).astype(np.float32) * 0.04
    _, r = random_rotate(np.zeros((1, 3), np.float32),
                         np.random.default_rng(3), 1)
    radius, extent = 0.075, 0.03

    w_dev = influence_weights_from_rel(
        jnp.asarray(rel), jnp.asarray(inds), n, radius,
        jnp.asarray(kpts), extent, out_dtype=jnp.float32,
        rot=jnp.broadcast_to(jnp.asarray(r), (n, 3, 3)))
    # host: rotate the dequantized rel, requantize exactly the same way
    rel_f = rel.astype(np.float32) * (radius / 32767.0)
    rel_rot = rel_f @ r
    # feed as f32-exact by scaling back without requantization loss:
    # use the op's own pipeline with rot=None on pre-rotated int16 would
    # requantize; instead compare against a numpy recompute.
    sq_rel = np.sum(rel_rot ** 2, -1)
    cross = np.einsum('nkd,pd->npk', rel_rot, kpts)
    sq_kp = np.sum(kpts ** 2, -1)
    sq = np.maximum(sq_rel[:, None, :] - 2 * cross + sq_kp[None, :, None],
                    0.0)
    want = np.maximum(1.0 - np.sqrt(sq + 1e-10) / (2 * extent), 0.0)
    want = want * (inds < n)[:, None, :]
    np.testing.assert_allclose(np.asarray(w_dev), want, rtol=1e-4,
                               atol=1e-5)


def test_cached_identity_matches_unaugmented(rng):
    """Cached batch with identity rotation + zero noise reproduces the
    plain unaugmented forward bit-for-bit."""
    cfg = tiny_cfg(augment_noise=0.0)
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    cache.add_pair(anc, pos, corr)
    batch = cache.sample_batch(rng, augment=True)
    batch['pyramid']['aug_rot'] = np.stack([np.eye(3, dtype=np.float32)] * 3)

    plain = make_training_batch(anc, pos, corr, cfg, rng=rng, augment=False)
    model, variables = init_kpfcnn(cfg, plain['pyramid'])
    d0, s0 = model.apply(variables, plain['pyramid'], training=False)
    d1, s1 = model.apply(variables, batch['pyramid'], training=False)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


def test_cached_rotation_changes_geometry_only_equivariantly(rng):
    """A rotated cached batch produces the same descriptors as rotating
    the rel vectors on the host (the model sees identical geometry)."""
    cfg = tiny_cfg(augment_noise=0.0)
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    cache.add_pair(anc, pos, corr)
    batch = cache.sample_batch(rng, augment=True)
    pyr = batch['pyramid']
    rots = np.asarray(pyr['aug_rot'])

    model, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    d_dev, s_dev = model.apply(variables, pyr, training=False)

    # host-side: rotate every rel table with the per-cloud rotations.
    # The device rotates in f32 from int16 rel; the host path below
    # requantizes to int16 (~1 lsb loss), so compare with loose tolerance.
    pyr_host = dict(cache._pairs[0]['pyramid'])
    lengths = [np.asarray(x) for x in pyr_host['lengths']]
    rels = []
    for l, rel in enumerate(pyr_host['rels']):
        rel_f = np.asarray(rel).astype(np.float32)
        out = rel_f.copy()
        start = 0
        for ci, n in enumerate(lengths[l]):
            out[start:start + n] = rel_f[start:start + n] @ rots[ci]
            start += int(n)
        rels.append(out.astype(np.int16))  # truncation loss ~1 lsb
    pyr_host['rels'] = tuple(rels)
    pool_rels = []
    for l, rel in enumerate(pyr_host['pool_rels']):
        rel_f = np.asarray(rel).astype(np.float32)
        out = rel_f.copy()
        start = 0
        for ci, n in enumerate(lengths[l + 1]):
            out[start:start + n] = rel_f[start:start + n] @ rots[ci]
            start += int(n)
        pool_rels.append(out.astype(np.int16))
    pyr_host['pool_rels'] = tuple(pool_rels)

    d_host, s_host = model.apply(variables, pyr_host, training=False)
    np.testing.assert_allclose(np.asarray(d_dev), np.asarray(d_host),
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(s_dev), np.asarray(s_host),
                               atol=5e-2)


@pytest.mark.slow
def test_cached_train_step_decreases_loss(rng):
    cfg = tiny_cfg()
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    cache.add_pair(anc, pos, corr)
    batches = cache.train_batches(rng)
    b0 = next(batches)
    _, variables = init_kpfcnn(cfg, b0['pyramid'])
    state = create_train_state(cfg, variables)
    step = make_train_step(cfg)
    state, m0 = step(state, b0)
    losses = [float(m0['total'])]
    for b in [next(batches) for _ in range(8)]:
        state, m = step(state, b)
        losses.append(float(m['total']))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses


def test_cache_rejects_scale_augmentation():
    cfg = tiny_cfg(augment_scale_min=0.9, augment_scale_max=1.1)
    with pytest.raises(ValueError, match='scale'):
        PairPyramidCache(cfg)


def test_split_shards_equal_sizes_cover_pool(rng):
    """Shards are equal-size (one jit compile) and cover every pair;
    a short last shard is padded with repeats, never silently dropped."""
    cfg = tiny_cfg(augment_noise=0.0)
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    for _ in range(5):                      # 5 pairs into 2 shards of 3
        cache.add_pair(anc, pos, corr)
    shards = cache.split_shards(2, np.random.default_rng(0))
    assert [len(s) for s in shards] == [3, 3]
    seen = {id(p) for s in shards for p in s._pairs}
    assert seen == {id(p) for p in cache._pairs}
    assert cache.split_shards(1, np.random.default_rng(0)) == [cache]


def test_stacked_pyramids_memoized(rng):
    """Shard rotation re-uploads the SAME host buffers: rebuilding the
    multi-GB stack per rotation leaked ~1 shard-size of host memory per
    cycle via buffers the backend client retains (incident 5,
    RESULTS.md — the r3 run was OOM-killed by the host kernel)."""
    cfg = tiny_cfg(augment_noise=0.0)
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    cache.add_pair(anc, pos, corr)
    first = cache.stacked_pyramids()
    assert cache.stacked_pyramids() is first
    # mutation invalidates the memo
    cache.add_pair(anc, pos, corr)
    second = cache.stacked_pyramids()
    assert second is not first
    cache.pad_to_multiple(4, np.random.default_rng(0))
    assert cache.stacked_pyramids() is not second


@pytest.mark.slow
def test_resident_pool_rotation_end_to_end(rng, tmp_path):
    """run_resident_training with 2 shards rotates through HBM (upload,
    free, re-upload) and keeps training/snapshotting across rotations."""
    from d3feat_tpu.train.resident import run_resident_training
    from d3feat_tpu.train.trainer import create_train_state
    cfg = tiny_cfg(epoch_steps=2)
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    for _ in range(4):
        cache.add_pair(anc, pos, corr)
    shards = cache.split_shards(2, np.random.default_rng(0))
    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    save = str(tmp_path / 'run')
    run_resident_training(cfg, shards, state, save,
                          rng=np.random.default_rng(1), epochs=4,
                          shard_epochs=1)
    log = (tmp_path / 'run' / 'training.txt').read_text()
    assert 'rotating resident pool shard 1 -> 0' in log
    import os
    assert os.path.isdir(str(tmp_path / 'run' / 'snap-3'))


def test_resident_rejects_unequal_shards(rng, tmp_path):
    from d3feat_tpu.train.resident import run_resident_training
    from d3feat_tpu.train.trainer import create_train_state
    cfg = tiny_cfg(epoch_steps=1)
    anc, pos, corr = synthetic_pair(rng)
    a, b = PairPyramidCache(cfg), PairPyramidCache(cfg)
    a.add_pair(anc, pos, corr)
    b.add_pair(anc, pos, corr)
    b.add_pair(pos, anc, corr[:, ::-1])
    _, variables = init_kpfcnn(cfg, a._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    with pytest.raises(ValueError, match='equal-size'):
        run_resident_training(cfg, [a, b], state, str(tmp_path / 'r'),
                              rng=np.random.default_rng(1), epochs=1)


def test_resident_rejects_over_budget_rotation_plan(rng, tmp_path,
                                                    monkeypatch):
    """A rotation plan whose total upload volume exceeds the host-pin
    budget hard-fails BEFORE any upload (the tunnel client pins one host
    copy per device_put — RESULTS.md incident 5)."""
    from d3feat_tpu.train import resident
    from d3feat_tpu.train.trainer import create_train_state
    cfg = tiny_cfg(epoch_steps=1)
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    for _ in range(4):
        cache.add_pair(anc, pos, corr)
    per_pair = cache.stacked_nbytes_per_pair()
    assert per_pair > 0
    shards = cache.split_shards(2, np.random.default_rng(0))
    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    # 10 epochs x shard_epochs=1 -> 10 uploads of a 2-pair shard; budget
    # set to afford only 3
    monkeypatch.setattr(resident, 'HOST_PIN_UPLOAD_BUDGET_BYTES',
                        3 * 2 * per_pair)
    with pytest.raises(ValueError, match='host-pin'):
        resident.run_resident_training(
            cfg, shards, state, str(tmp_path / 'r'),
            rng=np.random.default_rng(1), epochs=10, shard_epochs=1)
    assert not (tmp_path / 'r' / 'snap-0').exists()


@pytest.mark.slow
def test_resident_train_step_matches_cached(rng):
    """Resident-mode step (device-side pair slicing) computes the same
    update as the per-batch path given identical inputs."""
    from d3feat_tpu.train.trainer import make_resident_train_step
    cfg = tiny_cfg()
    anc, pos, corr = synthetic_pair(rng)
    cache = PairPyramidCache(cfg)
    cache.add_pair(anc, pos, corr)
    cache.add_pair(pos, anc, corr[:, ::-1])

    resident = cache.stacked_pyramids()
    small = cache.sample_small_batch(np.random.default_rng(5))

    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    rstep = make_resident_train_step(cfg)
    new_state, metrics = rstep(state, resident, small)
    assert np.isfinite(float(metrics['total']))

    # equivalent plain batch
    idx = int(small['pair_idx'])
    pyramid = dict(cache._pairs[idx]['pyramid'])
    pyramid['aug_rot'] = small['aug_rot']
    pyramid['aug_key'] = small['aug_key']
    batch = {'pyramid': pyramid, 'anc_inds': small['anc_inds'],
             'pos_inds': small['pos_inds'],
             'corr_valid': small['corr_valid'],
             'keypts_dists': small['keypts_dists']}
    step = make_train_step(cfg)
    new_state2, metrics2 = step(state, batch)
    np.testing.assert_allclose(float(metrics['total']),
                               float(metrics2['total']), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(new_state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
