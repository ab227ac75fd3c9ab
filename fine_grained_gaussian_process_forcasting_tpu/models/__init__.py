from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
    ForecastOutput,
)
from fine_grained_gaussian_process_forcasting_tpu.models.lstm import LSTMBackbone
from fine_grained_gaussian_process_forcasting_tpu.models.transformer import (
    Transformer,
)

__all__ = ["ForecastDenoising", "ForecastOutput", "LSTMBackbone", "Transformer"]
