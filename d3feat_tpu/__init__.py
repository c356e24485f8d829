"""D3Feat-TPU: a TPU-native joint 3D keypoint detector + descriptor framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of D3Feat
(CVPR'20, reference implementation: XuyangBai/D3Feat, TF1 + CUDA/C++ CPU ops).

Design stance (vs. the reference):
  * Everything with data-dependent shapes (voxel subsampling, radius
    neighbor search, batching) lives in a host-side preprocessing stage
    that emits fixed-shape, padded, masked arrays (`d3feat_tpu.data.pyramid`).
  * The whole network (KPConv pyramid + detection head) is one jitted XLA
    program over those static shapes (`d3feat_tpu.models.kpfcnn`).
  * The hot KPConv op has a fused Pallas TPU kernel
    (`d3feat_tpu.ops.kpconv_pallas`) and a pure-jnp reference path.
  * Scaling is via `jax.sharding.Mesh` data parallelism
    (`d3feat_tpu.parallel`), not sessions/NCCL.
"""

__version__ = "0.1.0"

from d3feat_tpu.config import Config  # noqa: F401
