"""Data-parallel training over a jax.sharding.Mesh.

The reference is strictly single-process/single-GPU (SURVEY.md §2.9); this
module is the TPU-native *new capability*: batch = B fragment pairs, one
pair per device along a 'data' mesh axis. Parameters and optimizer state
are replicated; XLA inserts the psum gradient all-reduce over ICI from the
sharding annotations (no hand-written collectives needed at 14M params —
the model is far below the sharding threshold for TP/PP).

Batch-norm under DP: each pair contributes its own masked moments (exactly
the reference's batch_num=1 semantics per device); the running stats are
updated with the across-pair mean of the per-pair moments.

Two step flavors:
  * `make_dp_train_step` — stacked batches shipped per step (fine when the
    host sits next to the chips);
  * `make_resident_dp_train_step` — the cached dataset is SHARDED across
    device HBM (`shard_resident`), each device slices its own pair by a
    local index; the host ships ~0.3 MB/step. This is the design for
    tunneled/remote accelerators and scales dataset memory out with the
    mesh.

Multi-host scaling (design note; this environment is single-process): each
host process builds/caches only its shard of the pair list (shard by
`jax.process_index()` over the sorted pair keys), `device_put`s it to its
addressable devices, and assembles the global resident arrays with
`jax.make_array_from_process_local_data` under the same NamedSharding; the
per-step small payloads are per-host as well. Input IO then scales with
hosts over DCN while gradients ride ICI — no cross-host data-path traffic.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from d3feat_tpu.config import Config
from d3feat_tpu.models.kpfcnn import KPFCNN
from d3feat_tpu.train.losses import d3feat_loss
from d3feat_tpu.train.trainer import TrainState, make_optimizer


def make_mesh(n_devices: int | None = None, axis: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'need {n_devices} devices, have {len(devices)}')
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def stack_batches(batches: List[Dict]) -> Dict:
    """Stack B single-pair batches (identical static shapes) along a new
    leading axis."""
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def shard_batch(batch: Dict, mesh: Mesh, axis: str = 'data') -> Dict:
    """Place a stacked batch with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(config: Config, mesh: Mesh, axis: str = 'data'
                       ) -> Callable:
    """Jitted data-parallel train step: (state, stacked_batch) ->
    (state, metrics). state replicated, batch sharded on its leading axis."""
    model = KPFCNN(config)
    tx = make_optimizer(config)
    has_deform = any('deformable' in b for b in config.architecture)
    mutable = (['batch_stats', 'intermediates'] if has_deform
               else ['batch_stats'])

    def per_pair_loss(params, batch_stats, kpoints, batch):
        variables = {'params': params, 'batch_stats': batch_stats,
                     'kpoints': kpoints}
        (desc, scores), mutated = model.apply(
            variables, batch['pyramid'], training=True,
            mutable=mutable)
        anc_i, pos_i = batch['anc_inds'], batch['pos_inds']
        losses = d3feat_loss(
            desc[anc_i], desc[pos_i], scores[anc_i], scores[pos_i],
            batch['keypts_dists'], batch['corr_valid'],
            safe_radius=config.safe_radius,
            pos_margin=config.pos_margin,
            neg_margin=config.neg_margin,
            log_scale=config.log_scale,
            det_weight=config.det_loss_weight,
            keypts_num=config.keypts_num,
            loss_type=config.loss_type)
        loss = losses['loss']
        if has_deform and config.offsets_loss != 'none':
            # mirror make_train_step: fold the sown offset regularization
            # into each pair's loss (advisor round-2 finding)
            off = config.offsets_decay * sum(jax.tree_util.tree_leaves(
                mutated.get('intermediates', {})))
            losses['offset_loss'] = off
            loss = loss + off
        return loss, (losses, mutated['batch_stats'])

    def loss_fn(params, batch_stats, kpoints, stacked_batch):
        per_pair = lambda b: per_pair_loss(params, batch_stats, kpoints, b)
        losses, (metrics, new_bs) = jax.vmap(per_pair)(stacked_batch)
        # mean over pairs -> grads get the 1/B factor; XLA all-reduces
        mean_loss = jnp.mean(losses)
        from d3feat_tpu.train.trainer import weight_l2
        reg = config.weights_decay * weight_l2(params)
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics['reg_loss'] = reg
        metrics['total'] = mean_loss + reg
        new_bs = jax.tree.map(lambda x: jnp.mean(x, axis=0), new_bs)
        return mean_loss + reg, (metrics, new_bs)

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(axis))

    @jax.jit
    def train_step(state: TrainState, stacked_batch
                   ) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.kpoints, stacked_batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, kpoints=state.kpoints,
                               opt_state=new_opt)
        return new_state, metrics

    def run(state, stacked_batch):
        state = jax.device_put(state, replicated)
        stacked_batch = jax.tree.map(
            lambda x: jax.device_put(x, sharded), stacked_batch)
        return train_step(state, stacked_batch)

    return run


def shard_resident(resident: Dict, mesh: Mesh, axis: str = 'data') -> Dict:
    """Shard a stacked cached dataset (data/cache.stacked_pyramids) along
    its pair axis across device HBM: with D devices each holds n_pairs/D
    pairs — dataset memory scales OUT with the mesh instead of being
    replicated. Pair counts must divide the mesh size (pad by repeating
    pairs if needed)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), resident)


def make_resident_dp_train_step(config: Config, mesh: Mesh,
                                axis: str = 'data') -> Callable:
    """Device-resident data-parallel train step.

    Combines the two scalable pieces:
      * the cached dataset is SHARDED across the mesh (`shard_resident`);
        each device samples pairs from its own shard — no batch shipping,
        no cross-device gathers on the data path;
      * gradients/metrics/BN moments are `pmean`ed over ICI inside a
        `shard_map`; every device applies the identical update to its
        replicated state.

    step(state, resident_sharded, small) -> (state, metrics), where small
    is a [D, ...]-stacked pytree of per-device payloads (pair_idx LOCAL to
    each device's shard, sampled correspondences, augmentation state).
    """
    from d3feat_tpu.train.trainer import weight_l2
    model = KPFCNN(config)
    tx = make_optimizer(config)
    has_deform = any('deformable' in b for b in config.architecture)
    mutable = (['batch_stats', 'intermediates'] if has_deform
               else ['batch_stats'])

    def per_pair_loss(params, batch_stats, kpoints, batch):
        variables = {'params': params, 'batch_stats': batch_stats,
                     'kpoints': kpoints}
        (desc, scores), mutated = model.apply(
            variables, batch['pyramid'], training=True,
            mutable=mutable)
        anc_i, pos_i = batch['anc_inds'], batch['pos_inds']
        losses = d3feat_loss(
            desc[anc_i], desc[pos_i], scores[anc_i], scores[pos_i],
            batch['keypts_dists'], batch['corr_valid'],
            safe_radius=config.safe_radius,
            pos_margin=config.pos_margin,
            neg_margin=config.neg_margin,
            log_scale=config.log_scale,
            det_weight=config.det_loss_weight,
            keypts_num=config.keypts_num,
            loss_type=config.loss_type)
        reg = config.weights_decay * weight_l2(params)
        losses['reg_loss'] = reg
        total = losses['loss'] + reg
        if has_deform and config.offsets_loss != 'none':
            off = config.offsets_decay * sum(jax.tree_util.tree_leaves(
                mutated.get('intermediates', {})))
            losses['offset_loss'] = off
            total = total + off
        losses['total'] = total
        return total, (losses, mutated['batch_stats'])

    def device_fn(state: TrainState, shard, small):
        # leading dim of `small` leaves is this device's slice (size 1)
        idx = small['pair_idx'][0]
        pyramid = jax.tree.map(lambda x: x[idx], shard)
        pyramid['aug_rot'] = small['aug_rot'][0]
        pyramid['aug_key'] = small['aug_key'][0]
        batch = {'pyramid': pyramid,
                 'anc_inds': small['anc_inds'][0],
                 'pos_inds': small['pos_inds'][0],
                 'corr_valid': small['corr_valid'][0],
                 'keypts_dists': small['keypts_dists'][0]}
        grad_fn = jax.value_and_grad(per_pair_loss, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.kpoints, batch)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        # guard the MEAN grads (post-pmean) so every device skips the
        # same steps — the guarded update stays bit-identical across the
        # replicated states (trainer.spike_guard; RESULTS.md incidents)
        from d3feat_tpu.train.trainer import spike_guard
        grads, metrics['gnorm'], metrics['skipped'] = spike_guard(
            grads, config)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, kpoints=state.kpoints,
                               opt_state=new_opt)
        return new_state, metrics

    mapped = jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(), P()),
        check_vma=False)
    step = jax.jit(mapped)

    replicated = NamedSharding(mesh, P())
    small_sharding = NamedSharding(mesh, P(axis))

    def run(state, resident_sharded, small_stacked):
        state = jax.device_put(state, replicated)

        def place(x):
            # multi-host samplers pre-assemble global sharded arrays
            # (parallel/multihost.py); only host numpy needs placing
            if isinstance(x, jax.Array):
                return x
            return jax.device_put(np.asarray(x), small_sharding)

        small = jax.tree.map(place, small_stacked)
        return step(state, resident_sharded, small)

    return run
