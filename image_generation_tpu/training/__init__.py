"""Training layer: schedules, fused step, Trainer container."""

from image_generation_tpu.training.schedules import geomspace_lr  # noqa: F401
from image_generation_tpu.training.step import (  # noqa: F401
    TrainState,
    make_train_fns,
)
from image_generation_tpu.training.trainer import Trainer, TrainingError  # noqa: F401
