"""N-BEATS: trend/seasonality/generic stacks with backcast subtraction.

Re-design of ``forecasting_models/NBeats.py:14-316``: default stacks
(trend, seasonality), 3 blocks per stack, thetas_dim (4, 8), polynomial
trend basis and harmonic seasonality basis over a [0,1) linspace, each
block a 4-layer ReLU MLP with shared theta heads (trend/seasonality) or
separate heads + basis linears (generic).  The doubly-nested block loop is
unrolled at trace time (6 blocks) — XLA fuses the chain.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

TREND = "trend"
SEASONALITY = "seasonality"
GENERIC = "generic"


def _linspace(backcast_length: int, forecast_length: int, forecast: bool):
    horizon = forecast_length if forecast else backcast_length
    return np.arange(horizon) / horizon


def seasonality_basis(p: int, t: np.ndarray) -> np.ndarray:
    """(p, len(t)) harmonic basis (``NBeats.py:209-216``)."""
    p1, p2 = (p // 2, p // 2) if p % 2 == 0 else (p // 2, p // 2 + 1)
    s1 = np.array([np.cos(2 * np.pi * i * t) for i in range(p1)])
    s2 = np.array([np.sin(2 * np.pi * i * t) for i in range(p2)])
    return np.concatenate([s1, s2], axis=0).astype(np.float32)


def trend_basis(p: int, t: np.ndarray) -> np.ndarray:
    """(p, len(t)) polynomial basis (``NBeats.py:219-223``)."""
    return np.array([t**i for i in range(p)]).astype(np.float32)


class _Block(nn.Module):
    units: int
    thetas_dim: int
    backcast_length: int
    forecast_length: int
    block_type: str

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = x
        for i in range(1, 5):
            h = nn.relu(nn.Dense(self.units, name=f"fc{i}")(h))

        tb = _linspace(self.backcast_length, self.forecast_length, False)
        tf = _linspace(self.backcast_length, self.forecast_length, True)

        if self.block_type == GENERIC:
            theta_b = nn.Dense(self.thetas_dim, use_bias=False, name="theta_b")(h)
            theta_f = nn.Dense(self.thetas_dim, use_bias=False, name="theta_f")(h)
            backcast = nn.Dense(self.backcast_length, name="backcast_fc")(theta_b)
            forecast = nn.Dense(self.forecast_length, name="forecast_fc")(theta_f)
            return backcast, forecast

        # trend / seasonality share one theta head (``NBeats.py:247-248``)
        theta_head = nn.Dense(self.thetas_dim, use_bias=False, name="theta")
        if self.block_type == TREND:
            basis_b, basis_f = trend_basis(self.thetas_dim, tb), trend_basis(
                self.thetas_dim, tf)
        else:
            basis_b, basis_f = (
                seasonality_basis(self.thetas_dim, tb),
                seasonality_basis(self.thetas_dim, tf),
            )
        return theta_head(h) @ basis_b, theta_head(h) @ basis_f


class NBeats(nn.Module):
    backcast_length: int
    forecast_length: int
    stack_types: Sequence[str] = (TREND, SEASONALITY)
    nb_blocks_per_stack: int = 3
    thetas_dim: Sequence[int] = (4, 8)
    hidden_layer_units: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (b, backcast_length[, 1]) -> (residual backcast, forecast)."""
        if x.ndim == 3 and x.shape[-1] == 1:
            x = x[..., 0]
        backcast = x
        forecast = jnp.zeros((x.shape[0], self.forecast_length), x.dtype)
        for sid, stype in enumerate(self.stack_types):
            # seasonality blocks use forecast_length thetas (``NBeats.py:272-276``)
            tdim = (self.forecast_length if stype == SEASONALITY
                    else self.thetas_dim[sid])
            for bid in range(self.nb_blocks_per_stack):
                b, f = _Block(
                    units=self.hidden_layer_units,
                    thetas_dim=tdim,
                    backcast_length=self.backcast_length,
                    forecast_length=self.forecast_length,
                    block_type=stype,
                    name=f"stack{sid}_block{bid}",
                )(backcast)
                backcast = backcast - b
                forecast = forecast + f
        return backcast, forecast
