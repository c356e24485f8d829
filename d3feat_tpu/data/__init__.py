from d3feat_tpu.data.pyramid import Pyramid, build_pyramid  # noqa: F401
