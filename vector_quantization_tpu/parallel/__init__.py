from .mesh import P, init_distributed, make_mesh, process_count, process_index, replicated
from .sharding import (
    DataParallelStrategy,
    FSDPStrategy,
    SingleDeviceStrategy,
    Strategy,
    batch_spec,
    fsdp_param_spec,
)
