from fine_grained_gaussian_process_forcasting_tpu.train.schedule import (
    noam_adam,
    noam_schedule,
)
from fine_grained_gaussian_process_forcasting_tpu.train.trainer import (
    Trainer,
    TrainState,
)

__all__ = ["noam_adam", "noam_schedule", "Trainer", "TrainState"]
