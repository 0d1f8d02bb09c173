from .mesh import (
    P,
    host_allreduce_sum,
    host_local_array,
    host_local_tree,
    init_distributed,
    make_mesh,
    process_count,
    process_index,
    replicated,
)
from .sharding import (
    DataParallelStrategy,
    FSDPStrategy,
    SingleDeviceStrategy,
    Strategy,
    TPStrategy,
    batch_spec,
    fsdp_param_spec,
)
