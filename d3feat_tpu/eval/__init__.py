from d3feat_tpu.eval.registration import (ransac_registration,  # noqa: F401
                                          rigid_transform_3d,
                                          transform_error)
from d3feat_tpu.eval.fmr import (build_correspondence,  # noqa: F401
                                 inlier_ratio_for_pair,
                                 feature_matching_recall)
from d3feat_tpu.eval.repeatability import keypoint_repeatability  # noqa: F401
from d3feat_tpu.eval.eth import evaluate_eth_fmr  # noqa: F401
