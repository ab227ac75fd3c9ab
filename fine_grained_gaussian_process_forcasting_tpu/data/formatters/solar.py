"""Solar formatter (reference ``data/solar.py:24-90``)."""

from fine_grained_gaussian_process_forcasting_tpu.data.base import (
    DataTypes,
    InputTypes,
)
from fine_grained_gaussian_process_forcasting_tpu.data.formatters.electricity import (
    ElectricityFormatter,
)


class SolarFormatter(ElectricityFormatter):
    _column_definition = [
        ("hours_from_start", DataTypes.REAL_VALUED, InputTypes.TIME),
        ("day_of_week", DataTypes.REAL_VALUED, InputTypes.KNOWN_INPUT),
        ("hour", DataTypes.REAL_VALUED, InputTypes.KNOWN_INPUT),
        ("Power(MW)", DataTypes.REAL_VALUED, InputTypes.TARGET),
        ("id", DataTypes.REAL_VALUED, InputTypes.ID),
        ("categorical_id", DataTypes.CATEGORICAL, InputTypes.STATIC_INPUT),
        ("capacity", DataTypes.CATEGORICAL, InputTypes.STATIC_INPUT),
    ]
