"""DLinear: moving-average series decomposition + two linear heads.

Re-design of ``forecasting_models/DLinear.py:7-85`` (shared-channel
variant, ``individual=False``): decompose with a kernel-25 moving average
(edge-replicated), map seasonal and trend components seq_len -> pred_len
with linears initialized to 1/seq_len (the reference's explicit init).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def moving_avg(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Trend extraction with replicated-edge padding
    (``DLinear.py:12-28``). x: (b, l, c)."""
    pad = (kernel_size - 1) // 2
    front = jnp.repeat(x[:, :1, :], pad, axis=1)
    end = jnp.repeat(x[:, -1:, :], pad, axis=1)
    xp = jnp.concatenate([front, x, end], axis=1)
    csum = jnp.cumsum(
        jnp.pad(xp, ((0, 0), (1, 0), (0, 0))), axis=1, dtype=jnp.float32
    )
    return (csum[:, kernel_size:] - csum[:, :-kernel_size]) / kernel_size


def series_decomp(x: jnp.ndarray, kernel_size: int = 25):
    """(residual, moving_mean) (``DLinear.py:31-42``)."""
    mean = moving_avg(x, kernel_size)
    return x - mean, mean


class DLinear(nn.Module):
    seq_len: int
    pred_len: int
    kernel_size: int = 25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (b, seq_len, c) -> (b, pred_len, c)."""
        seasonal, trend = series_decomp(x, self.kernel_size)
        init = nn.initializers.constant(1.0 / self.seq_len)
        seasonal_out = nn.Dense(
            self.pred_len, kernel_init=init, name="linear_seasonal"
        )(seasonal.transpose(0, 2, 1))
        trend_out = nn.Dense(
            self.pred_len, kernel_init=init, name="linear_trend"
        )(trend.transpose(0, 2, 1))
        return (seasonal_out + trend_out).transpose(0, 2, 1)
