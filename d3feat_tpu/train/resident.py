"""Device-resident training loop, shared by the dataset entry scripts.

The whole cached dataset lives in device HBM (see `data/cache.py` and
`train/trainer.make_resident_train_step`); each step ships only a pair
index + sampled correspondences + augmentation state (~0.3 MB).  The
loop adds, beyond the reference trainer (`utils/trainer.py:200-498`):

  * kill-file graceful stop (reference parity: `running_PID.txt`);
  * resume numbering from the restored optimizer step so the lr
    schedule, logs and snap-N names stay continuous;
  * **automatic collapse recovery** (no reference analog — its recovery
    is a manual restart): on two consecutive absurd/non-finite loss
    checks, or a sustained dead accuracy after the run has ever been
    good, restore the last HEALTHY snapshot, halve the lr on top of the
    schedule, and continue.  Collapsed states are never snapshotted.
    Incident history: RESULTS.md.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Optional

import jax
import numpy as np

from d3feat_tpu.config import Config
from d3feat_tpu.train.trainer import make_resident_train_step
from d3feat_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

# The axon tunnel client pins one full HOST copy of every device_put,
# forever (RESULTS.md incident 5: a standalone probe measured 4
# upload+delete+gc cycles of a 0.5 GB array growing RSS by exactly 2 GB).
# Every resident-pool upload therefore permanently consumes host RAM equal
# to the shard size; a rotation plan whose total upload volume exceeds
# what the host can absorb gets the process OOM-killed mid-run (the r3
# 3DMatch run died at 122 GB RSS after ~5 rotations of an 11.4 GB shard
# on a 125 GB host).  Budget: host RAM minus the in-RAM pool itself and
# process overhead — ~90 GB here.  Plans exceeding it hard-fail up front.
HOST_PIN_UPLOAD_BUDGET_BYTES = int(90e9)


def _rss_gb() -> float:
    """Host resident-set size in GB (reference training.txt logs RSS via
    psutil, `utils/trainer.py:316-328`; /proc avoids the dependency).
    Here it is also the early-warning gauge for the axon per-device_put
    host pin (RESULTS.md incident 5)."""
    try:
        with open('/proc/self/status') as fh:
            for line in fh:
                if line.startswith('VmRSS:'):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def _upload(cache, mesh=None):
    """device_put a shard's stacked pyramids and force completion.

    With a mesh, the pair axis is sharded contiguously across devices
    (`parallel.shard_resident`): dataset HBM scales OUT with the mesh."""
    t0 = time.perf_counter()
    if hasattr(cache, 'resident'):
        # multi-host sampler: each process uploads its local stack and
        # the global sharded arrays are assembled across processes
        # (parallel.multihost.assemble_global)
        resident = cache.resident()
    elif mesh is not None:
        from d3feat_tpu.parallel.data_parallel import shard_resident
        resident = shard_resident(cache.stacked_pyramids(), mesh)
    else:
        resident = jax.device_put(cache.stacked_pyramids())
    jax.block_until_ready(jax.tree.leaves(resident)[0])
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree.leaves(resident))
    print(f'resident dataset: {len(cache)} pairs, {n_bytes / 1e9:.2f} GB '
          f'uploaded in {time.perf_counter() - t0:.0f} s', flush=True)
    return resident


def run_resident_training(
    cfg: Config,
    cache,
    state,
    save_dir: str,
    *,
    rng: np.random.Generator,
    epochs: Optional[int] = None,
    restore_snap: Optional[str] = None,
    shard_epochs: int = 1,
    mesh=None,
) -> None:
    """Upload the cache to HBM and run the training loop with recovery.

    `state` must already be restored from `restore_snap` by the caller
    (the path is only used as the initial recovery point).

    `cache` may be a single `PairPyramidCache` or a sequence of
    EQUAL-size shards (`PairPyramidCache.split_shards`): shards rotate
    through HBM every `shard_epochs` epochs (free the old shard, upload
    the next), so the training pool can exceed device memory.  Equal
    shard sizes keep the jitted step's shapes constant — one compile.
    The swap costs one upload (~0.5 min/GB on the tunnel); amortize with
    `shard_epochs` > 1 on slow links.

    With `mesh` (a 1-axis jax.sharding.Mesh), the resident pool is
    SHARDED across the mesh's device HBM and each step trains one pair
    per device with an ICI gradient pmean
    (`parallel.make_resident_dp_train_step`): D-way throughput AND D-way
    dataset memory from the same loop.
    """
    os.makedirs(save_dir, exist_ok=True)
    cfg.save(os.path.join(save_dir, 'parameters.txt'))
    shards = list(cache) if isinstance(cache, (list, tuple)) else [cache]
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    if mesh is not None:
        for s in shards:
            s.pad_to_multiple(n_dev, rng)
    if len({len(s) for s in shards}) > 1:
        raise ValueError('resident pool shards must be equal-size '
                         '(one jit compile); use split_shards')
    epochs_planned = (epochs or cfg.max_epoch)
    epoch0_planned = int(state.step) // cfg.epoch_steps
    if hasattr(shards[0], 'stacked_nbytes_per_pair'):
        shard_bytes = shards[0].stacked_nbytes_per_pair() * len(shards[0])
        n_up = (1 if len(shards) == 1 else max(
            1, -(-max(epochs_planned - epoch0_planned, 1)
                 // max(shard_epochs, 1))))
        if n_up * shard_bytes > HOST_PIN_UPLOAD_BUDGET_BYTES:
            raise ValueError(
                f'resident rotation plan uploads {n_up} shards x '
                f'{shard_bytes / 1e9:.1f} GB = '
                f'{n_up * shard_bytes / 1e9:.0f} GB, over the '
                f'{HOST_PIN_UPLOAD_BUDGET_BYTES / 1e9:.0f} GB host-pin '
                f'budget (the tunnel client pins one host copy per '
                f'device_put — RESULTS.md incident 5). Raise '
                f'--shard-epochs, lower --epochs, or use a single '
                f'no-rotation shard that fits HBM.')
    shard_idx = -1           # uploaded lazily at the first epoch (shard
    resident = None          # choice keys off the epoch number on resume)

    if mesh is not None:
        from d3feat_tpu.parallel.data_parallel import (
            make_resident_dp_train_step)
        make_step = lambda c: make_resident_dp_train_step(c, mesh)  # noqa
    else:
        make_step = make_resident_train_step
    step_fn = make_step(cfg)
    kill_file = os.path.join(save_dir, 'running_PID.txt')
    with open(kill_file, 'w') as fh:
        fh.write(str(os.getpid()))
    log_f = open(os.path.join(save_dir, 'training.txt'), 'a')
    met_f = open(os.path.join(save_dir, 'metrics.jsonl'), 'a')
    epochs = epochs or cfg.max_epoch
    epoch0 = int(state.step) // cfg.epoch_steps
    if epoch0:
        print(f'resuming at epoch {epoch0} (step {int(state.step)})',
              flush=True)
    t_last = time.perf_counter()
    last_good_snap = restore_snap
    lr_scale = 1.0
    bad_checks = 0
    dead_checks = 0          # bounded desc-collapse: acc pinned ~0
    seen_good_acc = False    # arms the dead-acc trigger
    try:
        for epoch in range(epoch0, epochs):
            want = (epoch // max(shard_epochs, 1)) % len(shards)
            if want != shard_idx:
                if resident is not None:
                    note = (f'# epoch {epoch}: rotating resident pool '
                            f'shard {shard_idx} -> {want}')
                    print(note, flush=True)
                    log_f.write(note + '\n'); log_f.flush()
                    for x in jax.tree.leaves(resident):
                        x.delete()       # free HBM BEFORE the next upload
                    # drop the references and collect so any host-side
                    # buffers the backend client retains for the old
                    # upload are reclaimed before the new one allocates
                    # (incident 5, RESULTS.md: 122 GB host RSS)
                    resident = None
                    import gc
                    gc.collect()
                shard_idx = want
                cache = shards[shard_idx]
                resident = _upload(cache, mesh)
            epoch_healthy = True
            for i in range(cfg.epoch_steps):
                small = (cache.sample_small_batch_dp(rng, n_dev)
                         if mesh is not None
                         else cache.sample_small_batch(rng))
                state, metrics = step_fn(state, resident, small)
                if i % 100 == 0:
                    # one device_get for the whole dict: per-scalar float()
                    # fetches cost ~1.1 s tunnel RTT EACH (~9 s/log tick)
                    m = {k: float(v) for k, v in
                         jax.device_get(metrics).items()}
                    dt = time.perf_counter() - t_last
                    t_last = time.perf_counter()
                    line = (f'e{epoch:03d} s{i:05d} '
                            f'loss={m["total"]:.4f} '
                            f'desc={m["desc_loss"]:.4f} '
                            f'det={m["det_loss"]:.4f} '
                            f'acc={m["accuracy"]:.3f} dt={dt:.1f}s '
                            f'rss={_rss_gb():.1f}G')
                    print(line, flush=True)
                    log_f.write(line + '\n'); log_f.flush()
                    met_f.write(json.dumps(
                        {'epoch': epoch, 'step': i, **m}) + '\n')
                    met_f.flush()
                    healthy = (math.isfinite(m['total'])
                               and abs(m['total']) < 10.0)
                    bad_checks = 0 if healthy else bad_checks + 1
                    seen_good_acc |= m['accuracy'] > 0.3
                    dead = seen_good_acc and m['accuracy'] < 0.05
                    dead_checks = dead_checks + 1 if dead else 0
                    if ((bad_checks >= 2 or dead_checks >= 4)
                            and last_good_snap):
                        lr_scale *= 0.5
                        run_cfg = cfg.replace(
                            learning_rate=cfg.learning_rate * lr_scale)
                        note = (f'# collapse at e{epoch} s{i}: '
                                f'restoring {last_good_snap}, '
                                f'lr scale -> {lr_scale}')
                        print(note, flush=True)
                        log_f.write(note + '\n'); log_f.flush()
                        state = restore_checkpoint(
                            last_good_snap, jax.device_get(state))
                        step_fn = make_step(run_cfg)
                        bad_checks = 0
                        dead_checks = 0
                        epoch_healthy = False
                        break
                if not os.path.exists(kill_file):
                    break
            if epoch_healthy and bad_checks == 0 and dead_checks == 0:
                p = os.path.join(save_dir, f'snap-{epoch}')
                save_checkpoint(p, jax.device_get(state))
                last_good_snap = p
            if not os.path.exists(kill_file):
                print('# kill file removed, stopping', flush=True)
                break
    finally:
        if os.path.exists(kill_file):
            os.remove(kill_file)
