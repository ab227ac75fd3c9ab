from fine_grained_gaussian_process_forcasting_tpu.models.cmgp import CMGP
from fine_grained_gaussian_process_forcasting_tpu.models.deepar import (
    DeepAR,
    deepar_nll,
)
from fine_grained_gaussian_process_forcasting_tpu.models.dlinear import DLinear
from fine_grained_gaussian_process_forcasting_tpu.models.fedformer import (
    FEDformer,
    FEDformerConfig,
)
from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
    ForecastOutput,
)
from fine_grained_gaussian_process_forcasting_tpu.models.lstm import LSTMBackbone
from fine_grained_gaussian_process_forcasting_tpu.models.nbeats import NBeats
from fine_grained_gaussian_process_forcasting_tpu.models.transformer import (
    Transformer,
)

__all__ = [
    "DeepAR",
    "deepar_nll",
    "DLinear",
    "FEDformer",
    "FEDformerConfig",
    "ForecastDenoising",
    "ForecastOutput",
    "LSTMBackbone",
    "NBeats",
    "Transformer",
]
