"""Cached-pyramid training: build each pair's pyramid once, re-augment
per step on the device.

The reference rebuilds the full multiscale pyramid (C++ subsampling +
radius searches) for every training step because it augments the points
first (`datasets/ThreeDMatch.py:266-273` -> `tf_descriptor_input`). On the
1-core training host that costs ~140 ms/step against a ~50 ms device step —
the input pipeline starves the TPU.

This module exploits two facts to move augmentation AFTER the pyramid:

  * **Rotation commutes with the radius search.** Distances are rotation-
    invariant, so the neighbor/pool/upsample index matrices of a rotated
    cloud equal those of the unrotated cloud; only the relative vectors
    rotate: rel' = rel @ R. For the constant-ones-input network
    (`datasets/ThreeDMatch.py:316`) the forward depends on geometry ONLY
    through rel (host_geometry mode), so rotating rel on device is exactly
    equivalent to rotating the cloud on the host.
  * **Noise is tiny.** The reference jitters points by U[0, noise) per
    coordinate before the search (noise = 0.005 m vs radius 0.075 m); its
    effect on rel is the difference of two jitters (triangular on
    (-noise, noise)), applied on device. Its effect on which points fall
    inside the radius / voxel-grid barycenters is not reproduced.

Documented deviations from the reference's rotate-then-build order:
  * the voxel-grid subsampling pattern is the unrotated pair's (the
    reference re-voxelizes under each random rotation — here each pair
    always has the same pyramid *structure*; rel geometry still varies);
  * boundary neighbors that the jitter would push in/out of the radius
    stay fixed.

Per-step host work drops to correspondence sampling + dict assembly
(~1 ms); the TPU sees a fresh rotation + jitter every step via the
'aug_rot' [B+1, 3, 3] and 'aug_key' entries consumed by
`models.blocks.BlockCtx` / `ops.kpconv.influence_weights_from_rel`.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.data.augment import random_rotate
from d3feat_tpu.data.batching import make_training_batch


def _tree_leaves(tree):
    """Flatten a nested dict/tuple/list of arrays without importing jax
    (cache building runs on hosts that may not want a jax import)."""
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _tree_leaves(tree[k])
    elif isinstance(tree, (list, tuple)):
        for x in tree:
            yield from _tree_leaves(x)
    else:
        yield tree


class PairPyramidCache:
    """RAM cache of unaugmented training batches with per-step device
    re-augmentation."""

    def __init__(self, config: Config):
        if (config.augment_scale_min != 1.0
                or config.augment_scale_max != 1.0):
            raise ValueError(
                'cached pyramids cannot replay scale augmentation (scale '
                'changes which points fall inside the fixed search radii); '
                'use the rebuild-per-step pipeline for KITTI-style configs')
        if not config.host_geometry:
            raise ValueError('cached pyramids require host_geometry=True '
                             '(augmentation rides the rel vectors)')
        self.config = config
        self._pairs: List[Dict] = []
        self._stacked = None     # stacked_pyramids memo; see its docstring

    def __len__(self) -> int:
        return len(self._pairs)

    def _set_pairs(self, pairs: List[Dict]) -> None:
        """Replace the pair list and invalidate the stacked memo — every
        mutation of `_pairs` must go through here or `_append_record` so a
        later `stacked_pyramids()` can never return a stale stack."""
        self._pairs = pairs
        self._stacked = None

    def _append_record(self, rec: Dict) -> None:
        self._pairs.append(rec)
        self._stacked = None

    def add_pair(self, anc_points: np.ndarray, pos_points: np.ndarray,
                 correspondences: np.ndarray) -> None:
        """Build and cache the unaugmented padded batch for one pair."""
        base = make_training_batch(anc_points, pos_points,
                                   np.zeros((0, 2), np.int64),
                                   self.config, augment=False)
        self._append_record({
            'pyramid': base['pyramid'],
            'anc_points': np.asarray(anc_points, np.float32),
            'n_anc': len(anc_points),
            'corr': np.asarray(correspondences, np.int64),
        })

    def sample_batch(self, rng: np.random.Generator,
                     augment: bool = True) -> Dict:
        """One training batch: cached pyramid + fresh correspondence sample
        + fresh device-side augmentation state."""
        cfg = self.config
        pair = self._pairs[int(rng.integers(len(self._pairs)))]
        m = cfg.keypts_num
        corr = pair['corr']
        n_corr = len(corr)
        anc_inds = np.zeros(m, np.int32)
        pos_inds = np.zeros(m, np.int32)
        valid = np.zeros(m, bool)
        if n_corr > 0:
            sel = rng.integers(0, n_corr, size=m)
            picked = corr[sel]
            anc_inds[:] = picked[:, 0]
            pos_inds[:] = picked[:, 1] + pair['n_anc']
            valid[:] = True
        kp = pair['anc_points'][anc_inds]
        keypts_dists = np.sqrt(
            np.sum((kp[:, None] - kp[None, :]) ** 2, axis=-1) + 1e-12
        ).astype(np.float32)

        pyramid = dict(pair['pyramid'])
        if augment:
            rots = []
            for _ in range(2):  # independent per-cloud rotations
                _, r = random_rotate(
                    np.zeros((1, 3), np.float32), rng,
                    1 if cfg.augment_rotation else 0)
                rots.append(r)
            rots.append(np.eye(3, dtype=np.float32))  # pad rows
            pyramid['aug_rot'] = np.stack(rots).astype(np.float32)
            pyramid['aug_key'] = rng.integers(
                0, 2 ** 32, size=2, dtype=np.uint32)
        return {
            'pyramid': pyramid,
            'anc_inds': anc_inds,
            'pos_inds': pos_inds,
            'corr_valid': valid,
            'keypts_dists': keypts_dists,
        }

    def train_batches(self, rng: np.random.Generator,
                      augment: bool = True) -> Iterator[Dict]:
        while True:
            yield self.sample_batch(rng, augment=augment)

    def split_shards(self, n_shards: int,
                     rng: np.random.Generator) -> List['PairPyramidCache']:
        """Split into `n_shards` EQUAL-size caches for resident pool
        rotation (`train.resident.run_resident_training`).

        Equal sizes keep the stacked-pyramid leading dim identical across
        shards, so the jitted resident step compiles once.  Pairs are
        shuffled and dealt contiguously; a short last shard is padded with
        random repeats from the full pool (slight duplicate-sampling bias
        beats silently dropping pairs)."""
        if n_shards <= 1:
            return [self]
        order = rng.permutation(len(self._pairs))
        size = -(-len(self._pairs) // n_shards)        # ceil
        shards = []
        for i in range(n_shards):
            idx = list(order[i * size:(i + 1) * size])
            if len(idx) < size:
                pad = rng.choice(len(self._pairs), size - len(idx))
                idx.extend(int(p) for p in pad)
            shard = PairPyramidCache(self.config)
            shard._set_pairs([self._pairs[int(j)] for j in idx])
            shards.append(shard)
        return shards

    def pad_to_multiple(self, d: int, rng: np.random.Generator) -> None:
        """Append random repeat pairs until len divides `d` (mesh-sharded
        resident mode needs the pair axis divisible by the device count)."""
        extra = (-len(self._pairs)) % d
        for j in rng.choice(len(self._pairs), extra):
            self._append_record(self._pairs[int(j)])

    def stacked_nbytes_per_pair(self) -> int:
        """Bytes one pair contributes to the stacked resident dataset —
        lets `train.resident` validate an upload plan against the host-pin
        budget BEFORE building/uploading any multi-GB stack."""
        if not self._pairs:
            return 0
        leaves = [np.asarray(x) for x in
                  _tree_leaves(self._pairs[0]['pyramid'])]
        return sum(x.nbytes for x in leaves)

    # -- device-resident mode (tunneled TPUs) --------------------------------
    def stacked_pyramids(self) -> Dict:
        """Stack every cached pyramid along a new leading axis — the
        device-resident dataset for `make_resident_train_step` (upload
        once, slice by index on device).

        Memoized: shard rotation re-uploads the SAME host buffers every
        cycle.  Rebuilding the multi-GB stack per rotation leaked host
        memory at ~1 shard-size per cycle (the tunnel client retains a
        reference to uploaded host buffers; the r3 3DMatch run was
        OOM-killed by the HOST kernel at 122 GB RSS after ~5 rotations
        of an 11.4 GB shard — RESULTS.md incident 5)."""
        if getattr(self, '_stacked', None) is None:
            import jax
            pyrs = [p['pyramid'] for p in self._pairs]
            self._stacked = jax.tree.map(lambda *xs: np.stack(xs), *pyrs)
        return self._stacked

    def sample_small_batch(self, rng: np.random.Generator,
                           augment: bool = True,
                           pair_idx: Optional[int] = None) -> Dict:
        """The per-step host payload for resident mode: pair index,
        sampled correspondences, augmentation state (~0.3 MB). Pass
        `pair_idx` to pin the pair (multi-host samplers assign pairs to
        device blocks themselves)."""
        cfg = self.config
        idx = (int(rng.integers(len(self._pairs))) if pair_idx is None
               else int(pair_idx))
        pair = self._pairs[idx]
        m = cfg.keypts_num
        corr = pair['corr']
        anc_inds = np.zeros(m, np.int32)
        pos_inds = np.zeros(m, np.int32)
        valid = np.zeros(m, bool)
        if len(corr) > 0:
            sel = rng.integers(0, len(corr), size=m)
            picked = corr[sel]
            anc_inds[:] = picked[:, 0]
            pos_inds[:] = picked[:, 1] + pair['n_anc']
            valid[:] = True
        kp = pair['anc_points'][anc_inds]
        keypts_dists = np.sqrt(
            np.sum((kp[:, None] - kp[None, :]) ** 2, axis=-1) + 1e-12
        ).astype(np.float32)
        if augment:
            rots = []
            for _ in range(2):
                _, r = random_rotate(
                    np.zeros((1, 3), np.float32), rng,
                    1 if cfg.augment_rotation else 0)
                rots.append(r)
            rots.append(np.eye(3, dtype=np.float32))
        else:
            rots = [np.eye(3, dtype=np.float32)] * 3
        return {
            'pair_idx': np.int32(idx),
            'aug_rot': np.stack(rots).astype(np.float32),
            'aug_key': rng.integers(0, 2 ** 32, size=2, dtype=np.uint32),
            'anc_inds': anc_inds,
            'pos_inds': pos_inds,
            'corr_valid': valid,
            'keypts_dists': keypts_dists,
        }

    def sample_small_batch_dp(self, rng: np.random.Generator,
                              n_devices: int, augment: bool = True) -> Dict:
        """[D, ...]-stacked per-device payloads for the mesh-sharded
        resident step (`parallel.make_resident_dp_train_step`).

        With the pair axis sharded contiguously, device d owns global
        pairs [d*Q, (d+1)*Q); each payload samples within its device's
        block and carries the LOCAL index (what the shard_map body
        slices with)."""
        q, rem = divmod(len(self._pairs), n_devices)
        if rem:
            raise ValueError(f'{len(self._pairs)} pairs not divisible by '
                             f'{n_devices} devices; call pad_to_multiple')
        payloads = []
        for d in range(n_devices):
            local = int(rng.integers(q))
            p = self.sample_small_batch(rng, augment=augment,
                                        pair_idx=d * q + local)
            p['pair_idx'] = np.int32(local)
            payloads.append(p)
        return {k: np.stack([p[k] for p in payloads]) for k in payloads[0]}


def build_cache_from_dataset(dataset, split: str, config: Config,
                             max_pairs: Optional[int] = None,
                             rng: Optional[np.random.Generator] = None,
                             ) -> PairPyramidCache:
    """Fill a cache from a ThreeDMatchDataset-style adapter (same size
    limits as its per-step sampler)."""
    from d3feat_tpu.data.threedmatch import (MAX_TRAIN_POINTS,
                                             MIN_TRAIN_POINTS)
    cache = PairPyramidCache(config)
    keys = list(dataset.pair_keys[split])
    if rng is not None:
        rng.shuffle(keys)
    for key in keys:
        if max_pairs is not None and len(cache) >= max_pairs:
            break
        anc_id, pos_id = key.split('@')
        anc = dataset.points[split][anc_id]
        pos = dataset.points[split][pos_id]
        if not (MIN_TRAIN_POINTS <= len(anc) <= MAX_TRAIN_POINTS
                and MIN_TRAIN_POINTS <= len(pos) <= MAX_TRAIN_POINTS):
            continue
        try:
            cache.add_pair(anc, pos, dataset.corr[split][key])
        except ValueError:
            continue  # exceeds static capacities, same as a skip
    return cache


def build_cache_for_keys(dataset, split: str, config: Config,
                         keys: Sequence[str],
                         min_points: Optional[int] = None,
                         max_points: Optional[int] = None,
                         ) -> PairPyramidCache:
    """Cache EXACTLY the given pair keys, in order — the multi-host
    resident path (`parallel.multihost.process_pair_assignment`) needs
    every host's cache to hold pairs_per_device x local_devices entries
    in device-block order.

    A pair that fails the size gate or overflows the static capacities is
    replaced by a repeat of the previous cached pair instead of being
    skipped: block alignment is preserved with a purely local decision
    (no cross-host coordination), at the cost of slightly reweighting
    sampling toward the substitute."""
    from d3feat_tpu.data.threedmatch import (MAX_TRAIN_POINTS,
                                             MIN_TRAIN_POINTS)
    lo = MIN_TRAIN_POINTS if min_points is None else min_points
    hi = MAX_TRAIN_POINTS if max_points is None else max_points
    cache = PairPyramidCache(config)
    for key in keys:
        anc_id, pos_id = key.split('@')
        anc = dataset.points[split][anc_id]
        pos = dataset.points[split][pos_id]
        try:
            if not (lo <= len(anc) <= hi and lo <= len(pos) <= hi):
                raise ValueError('size gate')
            cache.add_pair(anc, pos, dataset.corr[split][key])
        except ValueError:
            if not cache._pairs:
                raise ValueError(
                    f'first assigned pair {key} unbuildable — cannot '
                    f'substitute; raise max_points or fix the assignment')
            cache._append_record(cache._pairs[-1])
    return cache


def build_cache_from_kitti(dataset, split: str, config: Config,
                           max_pairs: Optional[int] = None,
                           rng: Optional[np.random.Generator] = None,
                           ) -> PairPyramidCache:
    """Fill a cache from a KITTIDataset: GT-aligned anchor + positive +
    radius-matched correspondences per >=10 m pair (`data/kitti.py`).

    KITTI's scale augmentation ([0.8, 1.2], `datasets/KITTI.py:191-206`)
    cannot be replayed on a cached pyramid (scale changes which points
    fall inside the fixed search radii), so the config must disable it —
    `PairPyramidCache.__init__` enforces this.  Rotation and jitter ride
    the rel vectors on device as usual; translation augmentation is a
    no-op in this design (the network only consumes relative vectors).
    """
    cache = PairPyramidCache(config)
    pairs = dataset.prepare_pairs(split)
    order = list(range(len(pairs)))
    if rng is not None:
        rng.shuffle(order)
    for idx in order:
        if max_pairs is not None and len(cache) >= max_pairs:
            break
        out = dataset.load_pair(split, idx)
        if out is None:
            continue                      # <1024 matches, reference skip
        anc, pos, corr, _trans = out
        try:
            cache.add_pair(anc, pos, corr)
        except ValueError:
            continue                      # exceeds static capacities
    return cache
