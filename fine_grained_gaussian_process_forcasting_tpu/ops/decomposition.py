"""Series decomposition ops (Autoformer/FEDformer building blocks).

Re-designs of ``layers/Autoformer_EncDec.py:8-82``: seasonal layernorm,
edge-replicated moving average (asymmetric padding for even kernels,
matching the reference's front/end split), single and multi-kernel
decomposition with learned softmax mixing.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def moving_avg(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Edge-replicated moving average over axis 1; x: (b, l, c).

    Padding split matches ``Autoformer_EncDec.py:30-37``:
    front = k - 1 - floor((k-1)/2), end = floor((k-1)/2).
    """
    end = (kernel_size - 1) // 2
    front = kernel_size - 1 - end
    xp = jnp.concatenate(
        [jnp.repeat(x[:, :1], front, 1), x, jnp.repeat(x[:, -1:], end, 1)],
        axis=1,
    )
    csum = jnp.cumsum(
        jnp.pad(xp, ((0, 0), (1, 0), (0, 0))), axis=1, dtype=jnp.float32
    )
    return ((csum[:, kernel_size:] - csum[:, :-kernel_size]) /
            kernel_size).astype(x.dtype)


def series_decomp(x: jnp.ndarray, kernel_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(seasonal residual, trend) (``Autoformer_EncDec.py:41-52``)."""
    trend = moving_avg(x, kernel_size)
    return x - trend, trend


class SeriesDecompMulti(nn.Module):
    """Multi-kernel decomposition with learned per-kernel softmax weights
    (``series_decomp_multi``, ``Autoformer_EncDec.py:55-73``)."""

    kernel_sizes: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        means = jnp.stack(
            [moving_avg(x, k) for k in self.kernel_sizes], axis=-1
        )  # (b, l, c, K)
        weights = jax.nn.softmax(
            nn.Dense(len(self.kernel_sizes), name="mix")(x[..., None]), axis=-1
        )  # (b, l, c, K)
        trend = jnp.sum(means * weights, axis=-1)
        return x - trend, trend


class MyLayerNorm(nn.Module):
    """Seasonal layernorm: LN then subtract the temporal mean
    (``my_Layernorm``, ``Autoformer_EncDec.py:8-19``)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x_hat = nn.LayerNorm(epsilon=1e-5)(x)
        bias = jnp.mean(x_hat, axis=1, keepdims=True)
        return x_hat - bias
