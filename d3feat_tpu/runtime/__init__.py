from d3feat_tpu.runtime.tester import (DescriptorExtractor,  # noqa: F401
                                       generate_descriptors)
