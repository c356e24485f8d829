from d3feat_tpu.ops.subsample import grid_subsample, batch_grid_subsample  # noqa: F401
from d3feat_tpu.ops.neighbors import radius_neighbors, batch_radius_neighbors  # noqa: F401
from d3feat_tpu.ops.kernel_points import load_kernel_points  # noqa: F401
from d3feat_tpu.ops.kpconv import kpconv, unary_conv  # noqa: F401
