from mint_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from mint_tpu.train.controller import Controller  # noqa: F401
from mint_tpu.train.metrics_io import MetricsWriter  # noqa: F401
from mint_tpu.train.trainer import Trainer, TrainState  # noqa: F401
from mint_tpu.train import schedules  # noqa: F401
