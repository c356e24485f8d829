"""Self-describing configuration for D3Feat-TPU.

Mirrors the semantics of the reference config system (`utils/config.py:21-314`
in XuyangBai/D3Feat): class-attribute defaults, per-dataset overrides, and a
human-readable `parameters.txt` round-trip so checkpoint directories are
self-describing.  Re-designed as a frozen dataclass so it can be closed over
by jitted functions (static hashable config).

TPU-specific additions (no reference equivalent — they replace the
reference's *runtime* calibration passes, `datasets/common.py:509-673`):
  * ``neighborhood_limits``: fixed per-level neighbor degree K_l (the
    reference calibrates these per-run with a throwaway session; here they
    are config, produced offline by `d3feat_tpu.data.calibration`).
  * ``padded sizes``: per-level static point capacities used to pad the
    pyramid to shapes XLA can compile once.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, Tuple

# Architecture shipped with the reference pretrained models
# (training_3DMatch.py:41-59; results/Log_circleloss/parameters.txt).
D3FEAT_ARCHITECTURE: Tuple[str, ...] = (
    'simple',
    'resnetb',
    'resnetb_strided',
    'resnetb',
    'resnetb_strided',
    'resnetb',
    'resnetb_strided',
    'resnetb',
    'resnetb_strided',
    'resnetb',
    'nearest_upsample',
    'unary',
    'nearest_upsample',
    'unary',
    'nearest_upsample',
    'unary',
    'nearest_upsample',
    'unary',
    'last_unary',
)


def _num_layers(architecture: Tuple[str, ...]) -> int:
    """Number of pyramid levels = 1 + number of downsampling blocks before
    the first upsample (reference derives this at `utils/config.py:171-178`)."""
    n = 1
    for block in architecture:
        if 'upsample' in block or 'global' in block:
            break
        if 'pool' in block or 'strided' in block:
            n += 1
    return n


@dataclass(frozen=True)
class Config:
    """All knobs of the framework. Frozen + hashable so a Config can be a
    static argument of jitted functions."""

    # ---- dataset / task ----------------------------------------------------
    dataset: str = '3DMatch'

    # ---- architecture ------------------------------------------------------
    architecture: Tuple[str, ...] = D3FEAT_ARCHITECTURE
    num_kernel_points: int = 15           # K (reference: num_kernel_points=15)
    first_subsampling_dl: float = 0.03    # voxel size at level 0
    density_parameter: float = 5.0        # radius = dl * density_parameter
    KP_influence: str = 'linear'          # 'constant' | 'linear' | 'gaussian'
    KP_extent: float = 1.0
    convolution_mode: str = 'sum'         # 'sum' | 'closest'
    fixed_kernel_points: str = 'center'
    in_features_dim: int = 1
    first_features_dim: int = 64
    out_features_dim: int = 32            # descriptor dim (network_blocks.py:198)
    use_batch_norm: bool = True
    batch_norm_momentum: float = 0.98
    modulated: bool = False

    # ---- deformable KPConv (dead code in all shipped reference configs,
    # SURVEY.md §2.2; implemented for component parity) --------------------
    deform_version: int = 1               # 1: KPConv offsets; 2: MLP offsets
    offsets_loss: str = 'permissive'      # 'permissive'|'fitting'|'none'
                                          # (utils/config.py:150)
    offsets_decay: float = 1e-2           # (utils/config.py:151)
    gaussian_decay: float = 1e-3          # kernel_extents reg — no such
                                          # variable exists in any reference
                                          # path either; kept for parameters
                                          # .txt round-trip (config.py:140)

    # ---- static-shape (TPU) knobs ------------------------------------------
    # Per-level neighbor-degree caps K_l for conv/pool/upsample index matrices.
    # Defaults calibrated on the real demo fragments with the reference's
    # keep_ratio=0.8 histogram rule (datasets/common.py:572-673) via
    # d3feat_tpu.data.calibration.
    neighborhood_limits: Tuple[int, ...] = (36, 29, 30, 31, 31)
    # Maximum stacked points at level 0 (anchor + positive). Finer levels
    # derive their capacity via `level_capacity_ratios`.
    max_points: int = 65536
    # Upper bound on |level l+1| / |level l| after 2x voxel subsampling.
    # 3DMatch empirical worst case is ~0.4; 0.5 is safe for dense surface
    # scans (sparse synthetic clouds may need 1.0 or explicit level_caps).
    level_capacity_ratio: float = 0.5
    # Explicit per-level capacities; overrides the ratio derivation if set.
    level_caps: Tuple[int, ...] = ()
    # Per-level capacity ratios (len num_layers-1); overrides the scalar
    # ratio when set — coarse levels shrink faster than the first.
    level_capacity_ratios: Tuple[float, ...] = ()
    # Ship int16 relative vectors from the host radius search so the device
    # computes influence weights without a coordinate gather.
    host_geometry: bool = True
    # Width of the upsample index matrices. The shipped architectures only
    # use nearest_upsample (column 0); raise for simple_upsample /
    # resnetb_upsample blocks, which convolve over the upsample lists.
    upsample_k: int = 1
    # Training pyramids can carry host-built inverse adjacency lists so the
    # backward of the big feature gathers becomes a gather instead of a
    # scatter (ops/gather.py). Measured SLOWER end-to-end at demo-pair
    # scale (68.4 vs 49.7 ms/step: K_inv=2K doubles the gathered rows and
    # the raw-scatter microbenchmark overstated the fused backward's cost),
    # so off by default; kept for re-evaluation at larger point counts.
    train_inverse_gather: bool = False
    inverse_k: Tuple[int, ...] = ()

    def inverse_limits(self) -> Tuple[int, ...]:
        if self.inverse_k:
            return self.inverse_k
        return tuple(-(-2 * k // 8) * 8 for k in self.neighborhood_limits)
    # Round padded sizes up to a multiple of this (keeps XLA tiles aligned).
    size_multiple: int = 1024
    # Compute dtype for gather tables / conv einsums ('float32' keeps exact
    # reference-math parity; 'bfloat16' is ~2x faster on the MXU/gathers).
    compute_dtype: str = 'bfloat16'
    # The network input feature is the constant 1 (ThreeDMatch.py:316);
    # enables the gather-free first conv. Set False if feeding real features.
    ones_input_features: bool = True
    # Detection-head precision: 'compute' follows compute_dtype;
    # 'float32' runs the head (gather + saliency) in f32 even on the bf16
    # fast path.  The 250-keypoint score cut amplifies bf16
    # accumulation-order noise into different keypoint SETS between the
    # host- and device-pyramid paths (VALIDATION.md round 2); an f32 head
    # removes that at ~+3 ms for the 3.6M-row head gather.
    score_dtype: str = 'compute'
    # Floor on the per-cloud scalar max that normalizes decoder features
    # in the detection head (`models/D3Feat.py:84-90`): the reference's
    # `f / (cloud_max + 1e-6)` explodes in value AND gradient (the
    # backward carries ~1/cloud_max^2) on batches whose per-cloud feature
    # max is tiny — the root cause of the heavy det-loss gradient tail
    # that kept the round-3 global clip active on ~70% of steps
    # (RESULTS.md r3b). 0 = exact reference semantics; the floor only
    # binds on degenerate batches, never on a healthily trained network
    # whose feature maxima sit well above it.
    score_norm_floor: float = 0.0
    # Floor on the per-ROW channel max in the detection head's beta ratio
    # (`models/D3Feat.py:100-102`): the reference's `f/(1e-6+depth_max)`
    # divides by a per-row channel max that can sit arbitrarily close to
    # zero — or be NEGATIVE (all channels of a row negative), flipping the
    # denominator sign through ~0. Measured at snap-21 (round 4 lr=0
    # probe): with score_norm_floor alone the raw grad-norm tail persists
    # at p99 ~7e3, log-correlated 0.62 with |det_loss|, driven by rows
    # with tiny/negative depth_max. Since f is normalized to max 1 per
    # cloud, rows with depth_max below ~1% of the cloud max are
    # non-keypoints; flooring their denominator damps instead of
    # amplifies them. 0 = exact reference semantics.
    score_beta_floor: float = 0.0
    # Upper clamp on the detection score (0 = reference, no clamp). The
    # two floors above bound the det-head GRADIENT near its poles, but
    # the VALUE landscape still rewards runaway: an all-negative row has
    # a negative beta denominator (reference semantics), so score ~
    # alpha*|f|/|denom| grows without bound as features drift negative —
    # the det loss then pays unboundedly for pushing junk rows' scores up
    # (observed: r4a collapse, det_loss -430 within 200 steps). Healthy
    # trained scores sit ~0.6-0.8 (demo run), so a clamp at 3.0 never
    # binds on healthy rows while giving the det loss a bounded optimum;
    # past the clamp the score gradient is exactly zero.
    score_clamp: float = 0.0

    # ---- training ----------------------------------------------------------
    max_epoch: int = 200
    epoch_steps: int = 5000
    validation_size: int = 500
    learning_rate: float = 0.1
    momentum: float = 0.98
    lr_decay: float = 0.1 ** (1 / 80)     # per-epoch multiplier (training_3DMatch.py:108)
    grad_clip_norm: float = 100.0         # per-variable clip (utils/trainer.py:130-142)
    # stability guard with no reference analog: skip updates whose global
    # grad norm exceeds this (0 = off). See trainer.skip_spike_updates.
    grad_skip_threshold: float = 0.0
    # scale grads down to this global norm when exceeded (0 = off).
    # Unlike the skip guard every step still contributes a bounded update
    # — the round-3 run at lr 0.02 skipped 67% of its steps and froze;
    # clipping keeps the direction and bounds the magnitude. Applied to
    # the raw grads before the optax chain (same state-invariance rule
    # as the skip guard).
    grad_global_clip: float = 0.0
    weights_decay: float = 1e-6           # L2 on conv/unary weights (utils/config.py:137)
    batch_num: int = 1                    # fragment pairs per step
    keypts_num: int = 256                 # correspondences per pair
    det_loss_weight: float = 1.0
    safe_radius: float = 0.1              # false-negative mask radius (m)
    loss_type: str = 'circle_loss'        # 'circle_loss' | 'contrastive'
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    log_scale: float = 25.0
    snapshot_gap: int = 1

    # ---- augmentation (datasets/ThreeDMatch.py:24-45, KITTI.py:191-206) ----
    augment_noise: float = 0.005
    augment_rotation: bool = True
    augment_scale_min: float = 1.0
    augment_scale_max: float = 1.0
    augment_shift_range: float = 0.0

    # ---- misc ---------------------------------------------------------------
    kernel_seed: int = 42                 # seeds the kernel-point rotation/jitter
    saving_path: str = ''

    # -------------------------------------------------------------------------
    @property
    def num_layers(self) -> int:
        return _num_layers(self.architecture)

    @property
    def lr_decays(self) -> Dict[int, float]:
        """Reference-API-shaped per-epoch decay dict
        (`training_3DMatch.py:105-107`); our schedule is the constant
        `lr_decay` multiplier."""
        return {e: self.lr_decay for e in range(1, self.max_epoch)}

    def replace(self, **kw) -> 'Config':
        return dataclasses.replace(self, **kw)

    def level_capacities(self) -> Tuple[int, ...]:
        """Static per-level point capacities N_l (padded)."""
        if self.level_caps:
            assert len(self.level_caps) == self.num_layers
            return self.level_caps
        caps = []
        n = self.max_points
        for l in range(self.num_layers):
            m = self.size_multiple
            caps.append(int(-(-n // m) * m))
            if self.level_capacity_ratios:
                r = self.level_capacity_ratios[
                    min(l, len(self.level_capacity_ratios) - 1)]
            else:
                r = self.level_capacity_ratio
            n = max(int(n * r), m)
        return tuple(caps)

    # ---- parameters.txt round-trip ------------------------------------------
    def save(self, path: str) -> None:
        """Write a self-describing `parameters.txt` (same spirit as
        `utils/config.py:180-219`)."""
        lines = ['# D3Feat-TPU parameters', '']
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if isinstance(v, tuple):
                v = ' '.join(str(x) for x in v)
            lines.append(f'{f.name} = {v}')
        with open(path, 'w') as fh:
            fh.write('\n'.join(lines) + '\n')

    @classmethod
    def load(cls, path: str) -> 'Config':
        """Parse a `parameters.txt` produced by :meth:`save`
        (reference analog: `utils/config.py:221-314`)."""
        kw: Dict[str, object] = {}
        types = {f.name: f for f in dataclasses.fields(cls)}
        defaults = cls()
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith('#') or '=' not in line:
                    continue
                name, _, raw = line.partition('=')
                name, raw = name.strip(), raw.strip()
                if name == 'lr_decay_epochs':
                    # reference schedule format "1:d1 2:d2 ..."
                    # (utils/config.py:262-264); shipped configs use one
                    # constant multiplier -> our scalar lr_decay
                    decays = dict(
                        (int(e), float(d))
                        for e, d in (item.split(':') for item in raw.split()))
                    vals = set(decays.values())
                    if len(vals) > 1:
                        raise ValueError(
                            'non-constant lr_decay_epochs schedules are not '
                            'supported (every shipped reference config is '
                            'constant)')
                    kw['lr_decay'] = vals.pop()
                    continue
                if name not in types:
                    continue
                default = getattr(defaults, name)
                anno = str(types[name].type)
                if isinstance(default, bool):
                    kw[name] = raw in ('True', 'true', '1')
                elif isinstance(default, int):
                    kw[name] = int(raw)
                elif isinstance(default, float):
                    kw[name] = float(raw)
                elif isinstance(default, tuple):
                    items = raw.split()
                    # element type from the annotation (defaults may be ())
                    if 'int' in anno:
                        kw[name] = tuple(int(x) for x in items)
                    elif 'float' in anno:
                        kw[name] = tuple(float(x) for x in items)
                    else:
                        kw[name] = tuple(items)
                else:
                    kw[name] = raw
        return cls(**kw)


# Reference per-dataset configurations -----------------------------------------

def threedmatch_config(**overrides) -> Config:
    """Training config of `training_3DMatch.py:22-135`."""
    cfg = Config(
        dataset='3DMatch',
        first_subsampling_dl=0.03,
        safe_radius=0.1,
        keypts_num=256,
        augment_noise=0.005,
        # calibrated on the real demo fragments (worst-case |l+1|/|l| with
        # 1.3x margin); the generous scalar 0.5 wastes up to 26x compute at
        # the coarse levels. Inference retries overflowing fragments in a
        # safe wide-bucket program (runtime/tester.py).
        level_capacity_ratios=(0.29, 0.37, 0.37, 0.41),
    )
    return cfg.replace(**overrides) if overrides else cfg


def kitti_config(**overrides) -> Config:
    """Training config of `training_KITTI.py:22-136`."""
    cfg = Config(
        dataset='KITTI',
        first_subsampling_dl=0.30,
        safe_radius=1.0,
        keypts_num=512,
        augment_noise=0.01,
        augment_scale_min=0.8,
        augment_scale_max=1.2,
        augment_shift_range=2.0,
        max_points=32768,
    )
    return cfg.replace(**overrides) if overrides else cfg


def eth_test_config(**overrides) -> Config:
    """ETH zero-shot test rescaling of a 3DMatch model (`test_eth.py:37-39`)."""
    cfg = threedmatch_config().replace(
        dataset='ETH',
        first_subsampling_dl=0.05,
        KP_extent=2.0,
    )
    return cfg.replace(**overrides) if overrides else cfg
