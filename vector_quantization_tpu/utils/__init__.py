from .config import Config, load_config
from .filters import (
    NamedParametersFilter,
    filter_state_dict,
    mask_tree,
    partition_params,
)
from .flags import Store
from .registry import Registry, RegistryError
