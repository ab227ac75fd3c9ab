from fine_grained_gaussian_process_forcasting_tpu.data.formatters.air_quality import (
    AirQualityFormatter,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.covid import (
    CovidFormatter,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.electricity import (
    ElectricityFormatter,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.exchange import (
    ExchangeFormatter,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.solar import (
    SolarFormatter,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.traffic import (
    TrafficFormatter,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.watershed import (
    WatershedFormatter,
)

__all__ = [
    "AirQualityFormatter",
    "CovidFormatter",
    "ElectricityFormatter",
    "ExchangeFormatter",
    "SolarFormatter",
    "TrafficFormatter",
    "WatershedFormatter",
]
