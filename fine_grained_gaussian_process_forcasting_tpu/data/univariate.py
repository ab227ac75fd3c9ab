"""Univariate (target-only) data pipeline for the baseline models.

Re-design of the reference's pytorch-forecasting path
(``new_data_loader.py:11-126``, used by ``baselines.py:65-71`` and
``ARIMA.py:20-26``): 0.8/0.1/0.1 row splits, 8*24-step target history
windows, random subsampling, fixed seed 1234.  The pytorch-forecasting
``TimeSeriesDataSet`` machinery is replaced by the same vectorized gather
as ``window.py``.

Window layout matches the reference loaders: ``x_enc`` = first
``max_encoder_length - pred_len`` steps of the history, ``x_dec`` = last
``pred_len`` steps of the history, ``y`` = the next ``pred_len`` targets
(``new_data_loader.py:114-118``).
"""

from __future__ import annotations

import dataclasses
import numpy as np
import pandas as pd


@dataclasses.dataclass
class UnivariateBatches:
    x_enc: np.ndarray  # (B, bs, enc_len - pred_len, 1)
    x_dec: np.ndarray  # (B, bs, pred_len, 1)
    y: np.ndarray  # (B, bs, pred_len, 1)

    @property
    def n_batches(self) -> int:
        return self.x_enc.shape[0]

    def __iter__(self):
        for i in range(self.n_batches):
            yield self.x_enc[i], self.x_dec[i], self.y[i]


def _windows_from_series(
    values: np.ndarray,
    groups: np.ndarray,
    total_len: int,
    n_samples: int,
    rng: np.random.RandomState,
) -> np.ndarray:
    """All (total_len)-step windows that stay within one entity, randomly
    subsampled to n_samples (with replacement when scarce, matching
    ``RandomSampler(num_samples=...)`` semantics)."""
    starts = []
    n = len(values)
    for g in pd.unique(groups):
        idx = np.flatnonzero(groups == g)
        # contiguous runs assumed (frames sorted by id, time)
        lo, hi = idx[0], idx[-1] + 1
        if hi - lo >= total_len:
            starts.append(np.arange(lo, hi - total_len + 1))
    if not starts:
        raise ValueError("no entity long enough for the requested window")
    starts = np.concatenate(starts)
    sel = rng.choice(len(starts), size=n_samples, replace=len(starts) < n_samples)
    chosen = starts[sel]
    gather = chosen[:, None] + np.arange(total_len)[None, :]
    return values[gather]  # (n_samples, total_len)


class UnivariateLoader:
    def __init__(
        self,
        data: pd.DataFrame,
        target_col: str,
        pred_len: int,
        max_encoder_length: int = 8 * 24,
        max_train_sample: int = 32000,
        max_test_sample: int = 3840,
        batch_size: int = 256,
        id_col: str = "id",
        seed: int = 1234,
    ):
        self.pred_len = pred_len
        self.max_encoder_length = max_encoder_length
        rng = np.random.RandomState(seed)

        total_batches = int(len(data) / batch_size)
        train_len = int(total_batches * batch_size * 0.8)
        valid_len = int(total_batches * batch_size * 0.1)

        splits = {
            "train": (data[:train_len], max_train_sample),
            "valid": (data[train_len : train_len + valid_len], max_test_sample),
            "test": (
                data[train_len + valid_len : train_len + 2 * valid_len],
                max_test_sample,
            ),
        }

        total_len = max_encoder_length + pred_len
        out = {}
        for name, (df, n_samples) in splits.items():
            w = _windows_from_series(
                df[target_col].to_numpy(dtype=np.float32),
                df[id_col].to_numpy(),
                total_len,
                n_samples,
                rng,
            )
            hist = w[:, :max_encoder_length, None]
            y = w[:, max_encoder_length:, None]
            nb = len(w) // batch_size
            cut = nb * batch_size

            def rg(a, nb=nb, bs=batch_size, cut=cut):
                return a[:cut].reshape(nb, bs, *a.shape[1:])

            out[name] = UnivariateBatches(
                x_enc=rg(hist[:, : max_encoder_length - pred_len]),
                x_dec=rg(hist[:, max_encoder_length - pred_len :]),
                y=rg(y),
            )
        self.train_loader = out["train"]
        self.valid_loader = out["valid"]
        self.test_loader = out["test"]


TARGET_COLUMNS = {
    "traffic": "values",
    "electricity": "power_usage",
    "exchange": "OT",
    "solar": "Power(MW)",
    "air_quality": "NO2",
    "watershed": "Conductivity",
    "covid": "PEOPLE_POSITIVE_NEW_CASES_COUNT",
}
