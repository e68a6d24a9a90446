from .checkpoint import CheckpointManager  # noqa: F401
from .schedule import warmup_multistep  # noqa: F401
from .trainer import Trainer, TrainState, make_optimizer, make_train_step  # noqa: F401
