from d3feat_tpu.parallel.data_parallel import (  # noqa: F401
    make_dp_train_step, make_mesh, make_resident_dp_train_step,
    shard_batch, shard_resident, stack_batches)
from d3feat_tpu.parallel.extract import (  # noqa: F401
    make_dp_extract, pad_fragments)
from d3feat_tpu.parallel.multihost import (  # noqa: F401
    MultiHostResidentSampler, assemble_global, process_pair_assignment)
