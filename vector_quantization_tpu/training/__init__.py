from . import callbacks, checkpoints, metrics
from .optim import build_optimizer, build_schedule
from .runner import Trainer, Validator, build_runner
from .state import TrainState
