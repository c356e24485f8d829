"""Multi-host input sharding for resident data-parallel training.

The reference is single-process (SURVEY.md §2.9); this is the TPU-native
scale-out story for pod slices (many host processes, each owning a subset
of the chips). Design (scaling-book recipe): input IO scales with hosts
over DCN, gradients ride ICI — no cross-host data-path traffic.

  * The global pair list is split into one contiguous block per DEVICE
    (padded by wraparound so every device holds the same count — resident
    arrays are dense HBM tensors).
  * Each host process builds/caches ONLY the pairs of its addressable
    devices (`process_pair_assignment`), uploads its local stack, and the
    global sharded arrays are assembled with
    `jax.make_array_from_process_local_data` (`assemble_global`).
  * Per step, each host samples a small payload per local device with a
    pair index LOCAL to that device's block (`MultiHostResidentSampler`)
    and assembles the global [D, ...] payload the same way.

Single-process (this environment, and the virtual-CPU test mesh) is the
degenerate case: process_count=1 owns every device, and
`make_array_from_process_local_data` reduces to a sharded device_put —
so the identical code path is exercised by tests/test_multihost.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pad_to_multiple(keys: Sequence, multiple: int) -> List:
    """Pad a pair-key list by wraparound repetition so its length divides
    `multiple` (repeating a training pair only reweights sampling of the
    tail slightly; resident tensors must be dense)."""
    keys = list(keys)
    if not keys:
        raise ValueError('no pairs to assign')
    base = len(keys)
    i = 0
    while len(keys) % multiple:
        keys.append(keys[i % base])
        i += 1
    return keys


def process_pair_assignment(pair_keys: Sequence, n_devices: int,
                            process_index: int | None = None,
                            process_count: int | None = None,
                            ) -> Tuple[List, int, int]:
    """Split the global pair list into per-device blocks and return this
    process's share.

    Returns (local_keys, pairs_per_device, local_device_count):
      * `local_keys` — the keys this host must load/cache, ordered by its
        local devices' blocks (device i's block = local_keys[i*k:(i+1)*k]);
      * `pairs_per_device` k — identical on every host;
      * `local_device_count` — devices addressable by this process.

    Devices are assumed evenly divided across processes in mesh order
    (standard for TPU pod slices: `jax.devices()` groups by host).
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if n_devices % process_count:
        raise ValueError(f'{n_devices} devices do not divide evenly over '
                         f'{process_count} processes')
    local_dev = n_devices // process_count
    keys = pad_to_multiple(pair_keys, n_devices)
    k = len(keys) // n_devices
    start = process_index * local_dev * k
    return keys[start:start + local_dev * k], k, local_dev


def assemble_global(local_stacked: Dict, mesh: Mesh, axis: str = 'data',
                    ) -> Dict:
    """Assemble globally-sharded arrays from each process's local stack.

    `local_stacked` leaves have leading dim = (local pairs or local
    devices); the global leading dim is that × process_count. In a single
    process this is exactly a sharded device_put."""
    sharding = NamedSharding(mesh, P(axis))
    n_proc = jax.process_count()

    def leaf(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree.map(leaf, local_stacked)


class MultiHostResidentSampler:
    """Per-step small-payload sampler for multi-host resident DP.

    `cache` holds ONLY this host's pairs, ordered by local device block
    (build it from `process_pair_assignment`'s local_keys). Each call
    samples one payload per local device with `pair_idx` local to that
    device's block, stacks them, and (optionally) assembles the global
    [D, ...] arrays for `make_resident_dp_train_step`.
    """

    def __init__(self, cache, pairs_per_device: int,
                 local_device_count: int, mesh: Mesh, axis: str = 'data'):
        if len(cache) != pairs_per_device * local_device_count:
            raise ValueError(
                f'cache holds {len(cache)} pairs, expected '
                f'{pairs_per_device}x{local_device_count}')
        self.cache = cache
        self.k = pairs_per_device
        self.local_dev = local_device_count
        self.mesh = mesh
        self.axis = axis

    def resident(self) -> Dict:
        """Upload this host's pair stack; returns the global sharded
        resident dataset."""
        return assemble_global(self.cache.stacked_pyramids(), self.mesh,
                               self.axis)

    def sample(self, rng: np.random.Generator, augment: bool = True,
               assemble: bool = True) -> Dict:
        smalls = []
        for d in range(self.local_dev):
            local = int(rng.integers(self.k))
            s = self.cache.sample_small_batch(
                rng, augment=augment, pair_idx=d * self.k + local)
            s['pair_idx'] = np.int32(local)  # local to the device's block
            smalls.append(s)
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *smalls)
        if assemble:
            return assemble_global(stacked, self.mesh, self.axis)
        return stacked

    # -- resident-loop pool interface (train.resident) -----------------------
    # The sampler can stand in for a PairPyramidCache in
    # `run_resident_training(..., mesh=...)`: upload via assemble_global,
    # per-step payloads pre-assembled as global sharded arrays.
    def __len__(self) -> int:
        return len(self.cache) * jax.process_count()

    def pad_to_multiple(self, d: int, rng) -> None:
        # process_pair_assignment already padded to pairs_per_device x D
        if (self.k * self.local_dev * jax.process_count()) % d:
            raise ValueError('assignment does not cover the mesh')

    def sample_small_batch_dp(self, rng: np.random.Generator,
                              n_devices: int, augment: bool = True) -> Dict:
        if n_devices != self.local_dev * jax.process_count():
            raise ValueError(f'sampler assigned for '
                             f'{self.local_dev * jax.process_count()} '
                             f'devices, step wants {n_devices}')
        return self.sample(rng, augment=augment, assemble=True)
