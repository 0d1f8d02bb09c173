from .config import Config, load_config
from .flags import Store
from .registry import Registry, RegistryError
