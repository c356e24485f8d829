"""Training runtime: optimizer, jitted train/eval steps, epoch loop.

Replaces the reference `ModelTrainer` (`utils/trainer.py:107-498`) with a
functional JAX design: one jitted train step (forward + loss + SGD update)
over static-shape batches.

Optimizer parity with `utils/trainer.py:116-156` and
`training_3DMatch.py:101-122`:
  * SGD + momentum 0.98 (`tf.train.MomentumOptimizer`, non-Nesterov);
  * per-variable gradient clip to L2 norm 100 (`clip_by_norm`);
  * lr = learning_rate * lr_decay^epoch, re-assigned at epoch boundaries
    (`utils/trainer.py:377-381`);
  * L2 weight regularization weights_decay * sum(||w||^2 / 2) over conv and
    unary 'weights' params only (`models/KPFCNN_model.py:188-191`).

Deformable KPConv training parity (`utils/trainer.py:130-142`,
`models/KPFCNN_model.py:239-318`): gradients of offset-predictor params
(path contains 'offset_conv' / 'offset_mlp') are scaled x0.1 *before*
clipping, and the offset regularization sown by `DeformableKPConvOp`
is added as offsets_decay * sum(offset_loss). The reference's scaling
loop appends `offset_conv` grads twice (once scaled, once not — the
`if`/`if/else` bug at `utils/trainer.py:133-139`); we implement the clean
x0.1 the code obviously intends. Both paths are dead code in every
shipped reference config.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from d3feat_tpu.config import Config
from d3feat_tpu.models.kpfcnn import KPFCNN
from d3feat_tpu.train.losses import d3feat_loss


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    kpoints: Any
    opt_state: Any


def clip_by_per_variable_norm(max_norm: float) -> optax.GradientTransformation:
    """tf.clip_by_norm applied to each variable independently
    (`utils/trainer.py:130-142`)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            return g * jnp.minimum(1.0, max_norm / (norm + 1e-12))

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_offset_grads(factor: float) -> optax.GradientTransformation:
    """x0.1 on deformable offset-predictor grads, applied before the clip
    (`utils/trainer.py:130-142`; clean version of the reference's buggy
    double-append loop)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        flat = jax.tree_util.tree_flatten_with_path(updates)
        scaled = []
        for path, g in flat[0]:
            names = ''.join(str(getattr(k, 'key', getattr(k, 'name', '')))
                            for k in path)
            if 'offset_conv' in names or 'offset_mlp' in names:
                g = factor * g
            scaled.append(g)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(updates), scaled), state

    return optax.GradientTransformation(init_fn, update_fn)


def spike_guard(grads, config: Config):
    """Zero the gradients when their global norm exceeds
    `config.grad_skip_threshold` (0 = off, reference-parity default).

    Stability guard with no reference analog (the reference's only skip
    mechanism is the correspondence-count batch skip,
    `models/KPFCNN_model.py:172-186`): with momentum 0.98 a single spiked
    gradient keeps pushing for ~50 steps, which reproducibly collapses
    descriptors to a point (desc_loss pinned at softplus-of-margin,
    accuracy ~0; seen twice on the synthetic corpus).  The per-variable
    clip-100 does not stop it — a ~14M-param spike can reach global norm
    ~1000 with every variable under 100.  Healthy global norms at 3DMatch
    scale are ~0.3 (p99 0.41), so ~10x p99 = 4.0 is a safe threshold.

    Applied to the raw grads *before* the optimizer (zeroed grads also add
    nothing to the momentum trace), deliberately NOT as a chain element:
    the optax chain's state pytree must stay identical whether the guard
    is on or off so snapshots restore across the setting.

    With `config.grad_global_clip` > 0, grads are first SCALED down to
    that global norm when exceeded (optax.clip_by_global_norm math, kept
    out of the chain for the same state-invariance reason): the round-3
    lr-0.02 run had a median raw gnorm ~5.7 against a skip threshold of
    2.0 and silently skipped 67% of its updates — training froze for 5
    epochs.  Clipping keeps every step's direction with a bounded
    magnitude; the skip threshold (tested against the RAW norm) remains
    as a backstop for truly pathological steps.

    Returns (guarded_grads, gnorm, skipped?).
    """
    gnorm = optax.global_norm(grads)
    skipped = jnp.float32(0.0)
    if config.grad_skip_threshold > 0:
        keep = (gnorm <= config.grad_skip_threshold).astype(jnp.float32)
        grads = jax.tree.map(lambda g: g * keep, grads)
        skipped = jnp.float32(1.0) - keep
    if config.grad_global_clip > 0:
        scale = jnp.minimum(1.0, config.grad_global_clip /
                            jnp.maximum(gnorm, 1e-12))
        grads = jax.tree.map(lambda g: g * scale, grads)
    return grads, gnorm, skipped


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """offset-scale(0.1) -> clip(100) -> momentum(0.98) -> -lr(epoch)."""

    def lr_schedule(step):
        epoch = step // config.epoch_steps
        return config.learning_rate * jnp.power(config.lr_decay, epoch)

    return optax.chain(
        scale_offset_grads(0.1),
        clip_by_per_variable_norm(config.grad_clip_norm),
        optax.trace(decay=config.momentum, nesterov=False),
        optax.scale_by_learning_rate(lr_schedule),
    )


def weight_l2(params) -> jax.Array:
    """sum of ||w||^2/2 over 'weights' leaves (tf.nn.l2_loss semantics,
    `models/KPFCNN_model.py:188-191`)."""
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [getattr(k, 'key', getattr(k, 'name', '')) for k in path]
        if any('weights' in str(n) for n in names):
            total = total + 0.5 * jnp.sum(jnp.square(leaf))
    return total


def create_train_state(config: Config, variables: Dict) -> TrainState:
    tx = make_optimizer(config)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables['params'],
        batch_stats=variables.get('batch_stats', {}),
        kpoints=variables.get('kpoints', {}),
        opt_state=tx.init(variables['params']),
    )


def make_train_step(config: Config) -> Callable:
    """Returns a jitted train_step(state, batch) -> (state, metrics).

    batch keys:
      pyramid      — dict from build_pyramid
      anc_inds     — [M] int32 level-0 row of each anchor correspondence
      pos_inds     — [M] int32 level-0 row of each positive correspondence
      corr_valid   — [M] bool
      keypts_dists — [M, M] f32 spatial distances between the *unaugmented*
                     anchor keypoints (`models/KPFCNN_model.py:131-132`)
    """
    model = KPFCNN(config)
    tx = make_optimizer(config)
    has_deform = any('deformable' in b for b in config.architecture)
    mutable = (['batch_stats', 'intermediates'] if has_deform
               else ['batch_stats'])

    def loss_fn(params, batch_stats, kpoints, batch):
        variables = {'params': params, 'batch_stats': batch_stats,
                     'kpoints': kpoints}
        (desc, scores), mutated = model.apply(
            variables, batch['pyramid'], training=True, mutable=mutable)
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
        total = losses['loss'] + reg
        if has_deform and config.offsets_loss != 'none':
            # offset regularization sown by DeformableKPConvOp
            # (`models/KPFCNN_model.py:239-318`); each leaf is a scalar.
            off = sum(jax.tree_util.tree_leaves(
                mutated.get('intermediates', {})))
            off = config.offsets_decay * off
            losses['offset_loss'] = off
            total = total + off
        losses['reg_loss'] = reg
        losses['total'] = total
        return total, (losses, mutated['batch_stats'])

    @jax.jit
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.kpoints, batch)
        grads, metrics['gnorm'], metrics['skipped'] = spike_guard(
            grads, config)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, kpoints=state.kpoints,
                               opt_state=new_opt)
        return new_state, metrics

    return train_step


def make_resident_train_step(config: Config) -> Callable:
    """Device-resident-dataset train step for tunneled/remote TPUs.

    The plain step ships the full padded pyramid (~40 MB) host->device
    every step; over the axon tunnel that transfer dominates (~1 s/step vs
    a ~0.1 s device step). Here the ENTIRE stacked cache lives in HBM (a
    [n_pairs, ...]-stacked pytree, a few GB) and the step receives only a
    pair INDEX plus the small per-step tensors (sampled correspondences,
    augmentation state, ~0.3 MB); the pair's pyramid is sliced out
    on-device.

    Returns step(state, resident, small_batch) -> (state, metrics) where
    `resident` is the stacked pyramid pytree (pass the same device arrays
    every call — jit keeps them resident) and small_batch has keys:
    pair_idx, aug_rot, aug_key, anc_inds, pos_inds, corr_valid,
    keypts_dists.
    """
    base_step_factory_model = KPFCNN(config)
    tx = make_optimizer(config)
    has_deform = any('deformable' in b for b in config.architecture)
    mutable = (['batch_stats', 'intermediates'] if has_deform
               else ['batch_stats'])

    def loss_fn(params, batch_stats, kpoints, batch):
        variables = {'params': params, 'batch_stats': batch_stats,
                     'kpoints': kpoints}
        (desc, scores), mutated = base_step_factory_model.apply(
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
        losses['total'] = losses['loss'] + reg
        if has_deform and config.offsets_loss != 'none':
            # same handling as make_train_step: offset regularization
            # sown by DeformableKPConvOp must not be dropped in resident
            # mode (advisor round-2 finding)
            off = config.offsets_decay * sum(jax.tree_util.tree_leaves(
                mutated.get('intermediates', {})))
            losses['offset_loss'] = off
            losses['total'] = losses['total'] + off
        return losses['total'], (losses, mutated['batch_stats'])

    @jax.jit
    def step(state: TrainState, resident, small) -> Tuple[TrainState, Dict]:
        idx = small['pair_idx']
        pyramid = jax.tree.map(lambda x: x[idx], resident)
        pyramid['aug_rot'] = small['aug_rot']
        pyramid['aug_key'] = small['aug_key']
        batch = {'pyramid': pyramid,
                 'anc_inds': small['anc_inds'],
                 'pos_inds': small['pos_inds'],
                 'corr_valid': small['corr_valid'],
                 'keypts_dists': small['keypts_dists']}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs)), grads = grad_fn(
            state.params, state.batch_stats, state.kpoints, batch)
        grads, metrics['gnorm'], metrics['skipped'] = spike_guard(
            grads, config)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, kpoints=state.kpoints,
                               opt_state=new_opt)
        return new_state, metrics

    return step


def make_eval_step(config: Config) -> Callable:
    """Jitted validation step: forward (running BN stats) + losses."""
    model = KPFCNN(config)

    @jax.jit
    def eval_step(state: TrainState, batch) -> Dict:
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats,
                     'kpoints': state.kpoints}
        desc, scores = model.apply(variables, batch['pyramid'],
                                   training=False)
        anc_i, pos_i = batch['anc_inds'], batch['pos_inds']
        return d3feat_loss(
            desc[anc_i], desc[pos_i], scores[anc_i], scores[pos_i],
            batch['keypts_dists'], batch['corr_valid'],
            safe_radius=config.safe_radius,
            pos_margin=config.pos_margin,
            neg_margin=config.neg_margin,
            log_scale=config.log_scale,
            det_weight=config.det_loss_weight,
            keypts_num=config.keypts_num,
            loss_type=config.loss_type)

    return eval_step


def make_forward(config: Config) -> Callable:
    """Jitted inference: pyramid -> (descriptors, scores)."""
    model = KPFCNN(config)

    @jax.jit
    def forward(variables, pyramid):
        return model.apply(variables, pyramid, training=False)

    return forward


class Trainer:
    """Epoch loop with snapshots, lr decay (inside the schedule), logging,
    validation, and the reference's cooperative kill-file
    (`utils/trainer.py:222-224,330-332`)."""

    def __init__(self, config: Config, save_dir: str,
                 debug_nan: bool = False):
        self.config = config
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        config.save(os.path.join(save_dir, 'parameters.txt'))
        self.train_step = make_train_step(config)
        self.eval_step = make_eval_step(config)
        self.log_path = os.path.join(save_dir, 'training.txt')
        self.metrics_path = os.path.join(save_dir, 'metrics.jsonl')
        self.kill_file = os.path.join(save_dir, 'running_PID.txt')
        # NaN hunt mode (reference `debug_NaN`, utils/trainer.py:205-207,
        # 579-675): on a non-finite loss, dump the offending batch + a
        # per-variable NaN report and stop.
        self.debug_nan = debug_nan

    def _log(self, msg: str) -> None:
        with open(self.log_path, 'a') as fh:
            fh.write(msg + '\n')

    def train(
        self,
        state: TrainState,
        train_batches: Callable[[], Iterator[Dict]],
        val_batches: Optional[Callable[[], Iterator[Dict]]] = None,
        num_epochs: Optional[int] = None,
    ) -> TrainState:
        cfg = self.config
        num_epochs = num_epochs or cfg.max_epoch
        with open(self.kill_file, 'w') as fh:
            fh.write(str(os.getpid()))
        try:
            for epoch in range(num_epochs):
                state = self._run_epoch(state, train_batches, epoch)
                if val_batches is not None:
                    self._validate(state, val_batches, epoch)
                if (epoch + 1) % cfg.snapshot_gap == 0:
                    self.snapshot(state, epoch)
                if not os.path.exists(self.kill_file):
                    self._log(f'# kill file removed, stopping after epoch '
                              f'{epoch}')
                    break
        finally:
            if os.path.exists(self.kill_file):
                os.remove(self.kill_file)
        return state

    def _run_epoch(self, state, train_batches, epoch):
        cfg = self.config
        t_last = time.perf_counter()
        for i, batch in enumerate(train_batches()):
            if i >= cfg.epoch_steps:
                break
            state, metrics = self.train_step(state, batch)
            if self.debug_nan:
                total = float(metrics['total'])
                if not np.isfinite(total):
                    self._dump_nan_report(state, batch, metrics, epoch, i)
                    raise FloatingPointError(
                        f'non-finite loss at epoch {epoch} step {i}; '
                        f'debug dump in {self.save_dir}/nan_debug')
            if i % 100 == 0:
                # single transfer (per-scalar fetches are ~1.1 s RTT each
                # on tunneled TPUs)
                m = {k: float(v) for k, v in
                     jax.device_get(metrics).items()}
                dt = time.perf_counter() - t_last
                t_last = time.perf_counter()
                from d3feat_tpu.train.resident import _rss_gb
                self._log(
                    f'e{epoch:03d} s{i:05d} loss={m["total"]:.4f} '
                    f'desc={m["desc_loss"]:.4f} det={m["det_loss"]:.4f} '
                    f'acc={m["accuracy"]:.3f} d_pos={m["d_pos"]:.3f} '
                    f'd_neg={m["d_neg"]:.3f} dt={dt:.1f}s '
                    f'rss={_rss_gb():.1f}G')
                import json
                with open(self.metrics_path, 'a') as fh:
                    fh.write(json.dumps(
                        {'epoch': epoch, 'step': i, **m}) + '\n')
            if not os.path.exists(self.kill_file):
                break
        return state

    def _validate(self, state, val_batches, epoch):
        cfg = self.config
        agg: Dict[str, float] = {}
        n = 0
        for i, batch in enumerate(val_batches()):
            if i >= cfg.validation_size:
                break
            metrics = self.eval_step(state, batch)
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            n += 1
        if n:
            msg = ' '.join(f'{k}={v / n:.4f}' for k, v in sorted(agg.items()))
            self._log(f'# val e{epoch:03d} {msg}')

    def snapshot(self, state: TrainState, epoch: int) -> None:
        from d3feat_tpu.utils.checkpoint import save_checkpoint
        save_checkpoint(os.path.join(self.save_dir, f'snap-{epoch}'), state)

    def _dump_nan_report(self, state, batch, metrics, epoch, step) -> None:
        """Reference NaN hunt (`utils/trainer.py:579-675`): per-variable
        NaN percentages + the offending inputs, saved for offline replay."""
        out_dir = os.path.join(self.save_dir, 'nan_debug')
        os.makedirs(out_dir, exist_ok=True)
        lines = [f'# non-finite loss at epoch {epoch} step {step}',
                 f'# metrics: ' + ' '.join(
                     f'{k}={float(v):.4g}' for k, v in metrics.items())]
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                state.params)[0]:
            arr = np.asarray(leaf)
            frac = float(np.mean(~np.isfinite(arr)))
            if frac > 0:
                lines.append(f'{jax.tree_util.keystr(path)}: '
                             f'{100 * frac:.2f}% non-finite')
        with open(os.path.join(out_dir, 'report.txt'), 'w') as fh:
            fh.write('\n'.join(lines) + '\n')
        np.savez(os.path.join(out_dir, 'batch.npz'),
                 **{k: np.asarray(v) for k, v in batch.items()
                    if not isinstance(v, dict)})
