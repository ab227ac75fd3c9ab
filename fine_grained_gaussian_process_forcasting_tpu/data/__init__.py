from fine_grained_gaussian_process_forcasting_tpu.data.base import (
    DataTypes,
    GenericDataFormatter,
    InputTypes,
)
from fine_grained_gaussian_process_forcasting_tpu.data.experiment import (
    ExperimentConfig,
)
from fine_grained_gaussian_process_forcasting_tpu.data.window import (
    BatchedSplit,
    WindowedSplit,
    batch_sampled_data,
    sample_windows,
)

__all__ = [
    "DataTypes",
    "GenericDataFormatter",
    "InputTypes",
    "ExperimentConfig",
    "BatchedSplit",
    "WindowedSplit",
    "batch_sampled_data",
    "sample_windows",
]
