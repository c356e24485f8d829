"""Multi-host input sharding (parallel/multihost.py) on the virtual mesh.

Single-process degenerate case exercises the identical code path
(`make_array_from_process_local_data` assembly, block-local pair indices);
the pure assignment math is checked for real multi-process splits.
"""

import jax
import numpy as np
import pytest

from d3feat_tpu.parallel.multihost import (MultiHostResidentSampler,
                                           assemble_global,
                                           pad_to_multiple,
                                           process_pair_assignment)


def test_pad_to_multiple_wraps():
    assert pad_to_multiple([1, 2, 3], 4) == [1, 2, 3, 1]
    assert pad_to_multiple([1, 2, 3, 4], 4) == [1, 2, 3, 4]
    assert pad_to_multiple([1, 2, 3], 8) == [1, 2, 3, 1, 2, 3, 1, 2]
    with pytest.raises(ValueError):
        pad_to_multiple([], 4)


@pytest.mark.parametrize('n_pairs,n_dev,n_proc', [
    (16, 8, 1), (16, 8, 2), (16, 8, 4), (13, 8, 2), (3, 4, 2)])
def test_assignment_partitions_globally(n_pairs, n_dev, n_proc):
    """Every process's local keys, concatenated in process order, equal the
    padded global list — disjoint, complete, equally sized."""
    keys = [f'p{i}' for i in range(n_pairs)]
    padded = pad_to_multiple(keys, n_dev)
    shares = []
    for p in range(n_proc):
        local, k, local_dev = process_pair_assignment(
            keys, n_dev, process_index=p, process_count=n_proc)
        assert k == len(padded) // n_dev
        assert local_dev == n_dev // n_proc
        assert len(local) == k * local_dev
        shares.extend(local)
    assert shares == padded


def test_assignment_rejects_uneven_processes():
    with pytest.raises(ValueError):
        process_pair_assignment(['a'], 8, process_index=0, process_count=3)


def test_assemble_global_matches_device_put(rng):
    """Single-process assembly == sharded device_put (same shards)."""
    from d3feat_tpu.parallel import make_mesh, shard_resident
    mesh = make_mesh(8)
    tree = {'a': rng.random((8, 4)).astype(np.float32),
            'b': rng.integers(0, 9, (8, 3, 2)).astype(np.int32)}
    ours = assemble_global(tree, mesh)
    ref = shard_resident(tree, mesh)
    for k in tree:
        assert ours[k].sharding == ref[k].sharding
        np.testing.assert_array_equal(np.asarray(ours[k]),
                                      np.asarray(ref[k]))


@pytest.mark.slow
def test_multihost_resident_step(rng):
    """End-to-end: assignment -> local cache -> assembled resident +
    sampled smalls -> one resident-DP step; and the device-block-local
    pair indexing picks the intended pair (metrics match a directly
    constructed payload)."""
    from d3feat_tpu.data.cache import PairPyramidCache
    from d3feat_tpu.models import init_kpfcnn
    from d3feat_tpu.parallel import make_mesh
    from d3feat_tpu.parallel.data_parallel import (
        make_resident_dp_train_step)
    from d3feat_tpu.train.trainer import create_train_state
    from test_train import synthetic_pair, tiny_cfg

    n_dev = 4
    cfg = tiny_cfg()
    # 3 pairs over 4 devices -> padded to 4 by wraparound
    pairs = {f'pair{i}': synthetic_pair(np.random.default_rng(i), n=250)
             for i in range(3)}
    local_keys, k, local_dev = process_pair_assignment(
        sorted(pairs), n_dev, process_index=0, process_count=1)
    assert k == 1 and local_dev == n_dev and len(local_keys) == 4

    cache = PairPyramidCache(cfg)
    for key in local_keys:
        anc, pos, corr = pairs[key]
        cache.add_pair(anc, pos, corr)

    mesh = make_mesh(n_dev)
    sampler = MultiHostResidentSampler(cache, k, local_dev, mesh)
    resident = sampler.resident()
    small = sampler.sample(np.random.default_rng(7))

    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    rstep = make_resident_dp_train_step(cfg, mesh)
    new_state, metrics = rstep(state, resident, small)
    assert np.isfinite(float(metrics['total']))

    # same payload via host numpy (run() places it) -> identical metrics
    small_np = sampler.sample(np.random.default_rng(7), assemble=False)
    _, metrics2 = rstep(state, resident, small_np)
    np.testing.assert_allclose(float(metrics['total']),
                               float(metrics2['total']), rtol=1e-6)


@pytest.mark.slow
def test_multihost_sampler_drives_resident_loop(rng, tmp_path):
    """MultiHostResidentSampler stands in for the cache in
    run_resident_training(mesh=...): the single-process degenerate case
    of the multi-host CLI path (train_3dmatch.py --multihost)."""
    from d3feat_tpu.data.cache import PairPyramidCache
    from d3feat_tpu.parallel.data_parallel import make_mesh
    from d3feat_tpu.train.resident import run_resident_training
    from d3feat_tpu.train.trainer import create_train_state
    from d3feat_tpu.models import init_kpfcnn
    from test_train import synthetic_pair, tiny_cfg

    n_dev = 4
    cfg = tiny_cfg(epoch_steps=2)
    cache = PairPyramidCache(cfg)
    for i in range(2 * n_dev):            # 2 pairs per device block
        anc, pos, corr = synthetic_pair(np.random.default_rng(i), n=250)
        cache.add_pair(anc, pos, corr)
    mesh = make_mesh(n_dev)
    sampler = MultiHostResidentSampler(cache, 2, n_dev, mesh)

    _, variables = init_kpfcnn(cfg, cache._pairs[0]['pyramid'])
    state = create_train_state(cfg, variables)
    run_resident_training(cfg, sampler, state, str(tmp_path / 'mh'),
                          rng=np.random.default_rng(1), epochs=2,
                          mesh=mesh)
    import os
    assert os.path.isdir(str(tmp_path / 'mh' / 'snap-1'))


def test_build_cache_for_keys_substitutes_in_order():
    """Unbuildable pairs are replaced by repeats (block alignment is a
    local decision), never silently dropped."""
    from d3feat_tpu.data.cache import build_cache_for_keys
    from test_train import synthetic_pair, tiny_cfg

    cfg = tiny_cfg()
    anc, pos, corr = synthetic_pair(np.random.default_rng(0), n=250)
    pts = {'train': {'a': anc, 'b': pos,
                     'tiny': anc[:10]}}               # fails the size gate
    cor = {'train': {'a@b': corr, 'a@tiny': corr}}

    class FakeDataset:
        points = pts
        corr = cor

    cache = build_cache_for_keys(FakeDataset(), 'train', cfg,
                                 ['a@b', 'a@tiny'], min_points=50)
    assert len(cache) == 2
    assert cache._pairs[1] is cache._pairs[0]         # substituted repeat
