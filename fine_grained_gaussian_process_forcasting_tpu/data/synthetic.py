"""Synthetic dataset generators matching each formatter's schema.

The reference downloads public datasets (``data_loader.py:97-917``); in
offline environments and in tests we generate schema-identical frames with
seasonal + trend + noise structure so the full pipeline (formatter ->
windows -> model) can run end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _series(rng: np.random.Generator, n: int, period: int) -> np.ndarray:
    t = np.arange(n, dtype=np.float64)
    amp = rng.uniform(0.5, 2.0)
    phase = rng.uniform(0, 2 * np.pi)
    trend = rng.uniform(-0.001, 0.001) * t
    daily = amp * np.sin(2 * np.pi * t / period + phase)
    weekly = 0.4 * amp * np.sin(2 * np.pi * t / (7 * period) + phase / 2)
    noise = rng.normal(0, 0.3, size=n)
    return 5.0 + trend + daily + weekly + noise


def make_synthetic_frame(
    experiment: str,
    num_entities: int = 4,
    steps_per_entity: int = 1200,
    seed: int = 0,
) -> pd.DataFrame:
    """A dataframe with the exact column schema of ``experiment``."""
    rng = np.random.default_rng(seed)
    frames = []
    for ent in range(num_entities):
        n = steps_per_entity
        hours = np.arange(n, dtype=np.float64)
        target = _series(rng, n, period=24)
        base = {
            "hours_from_start": hours,
            "hour": hours % 24,
            "day_of_week": (hours // 24) % 7,
            "id": float(ent),
            "categorical_id": str(ent),
        }
        if experiment == "electricity":
            cols = dict(base, power_usage=target)
        elif experiment == "solar":
            cols = dict(base, **{"Power(MW)": np.abs(target)}, capacity=str(ent % 2))
        elif experiment == "traffic":
            cols = dict(base, values=target, time_on_day=hours % 24)
            cols.pop("hour")
        elif experiment == "exchange":
            cols = dict(base, OT=target)
            for k in range(6):
                cols[str(k)] = _series(rng, n, period=24)
        elif experiment == "covid":
            cols = {
                "days_from_start": hours,
                "day_of_week": (hours // 24) % 7,
                "PEOPLE_POSITIVE_NEW_CASES_COUNT": np.abs(target) * 100,
                "PEOPLE_DEATH_COUNT": np.abs(target) * 3,
                "Population Staying at Home": _series(rng, n, period=7),
                "Population Not Staying at Home": _series(rng, n, period=7),
                "id": float(ent),
                "categorical_id": str(ent),
            }
        elif experiment == "air_quality":
            cols = {
                "hours_from_start": hours,
                "NO2": np.abs(target) * 10,
                "CO": np.abs(_series(rng, n, period=24)),
                "TEMP": _series(rng, n, period=24) * 5 + 15,
                "hour": hours % 24,
                "day_of_week": (hours // 24) % 7,
                "id": float(ent),
            }
        elif experiment == "watershed":
            cols = dict(base, Conductivity=target, Q=np.abs(_series(rng, n, period=24)))
        elif experiment == "weather":
            # bgc-jena roof schema (download.download_weather output)
            cols = dict(
                base,
                **{
                    "T (degC)": _series(rng, n, period=24) * 8 + 10,
                    "p (mbar)": _series(rng, n, period=24) * 5 + 990,
                    "rh (%)": np.abs(_series(rng, n, period=24)) * 20 + 50,
                },
                days_from_start=hours // 24,
            )
        elif experiment == "ETTm2":
            # ETT schema: OT target + HUFL/HULL/MUFL/MULL/LUFL/LULL loads
            cols = dict(base, OT=target, days_from_start=hours // 24)
            for name in ("HUFL", "HULL", "MUFL", "MULL", "LUFL", "LULL"):
                cols[name] = _series(rng, n, period=96)
        elif experiment == "camel":
            cols = dict(
                base,
                streamflow=np.abs(target) * 50,
                days_from_start=hours // 24,
            )
        else:
            raise ValueError(f"no synthetic schema for {experiment}")
        frames.append(pd.DataFrame(cols))
    return pd.concat(frames, axis=0, ignore_index=True)
