"""Input embeddings for the FEDformer family.

Re-designs of ``layers/Embed.py:8-150``: circular token conv, sinusoidal
positional table, fixed/learned temporal embeddings, time-feature linear
embedding, and the composed DataEmbedding variants.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoid_table(n: int, d_model: int) -> np.ndarray:
    """(n, d_model) log-space sinusoid table (``Embed.py:12-21``)."""
    pe = np.zeros((n, d_model), dtype=np.float32)
    position = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div[: d_model // 2])
    return pe


class TokenEmbedding(nn.Module):
    """Circular k=3 Conv1d value embedding (``Embed.py:28-40``)."""

    d_model: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # circular padding over the time axis; x: (b, l, c)
        xp = jnp.concatenate([x[:, -1:], x, x[:, :1]], axis=1)
        y = nn.Conv(
            self.d_model, (3,), padding="VALID", use_bias=False,
            kernel_init=nn.initializers.kaiming_normal(),
            name="token_conv",
        )(xp)
        return y


class PositionalEmbedding(nn.Module):
    d_model: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sinusoid_table(self.max_len, self.d_model))
        return table[None, : x.shape[1]]


class FixedEmbedding(nn.Module):
    """Sinusoid lookup table, not trained (``Embed.py:43-60``)."""

    c_in: int
    d_model: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sinusoid_table(self.c_in, self.d_model))
        return table[x.astype(jnp.int32)]


class TemporalEmbedding(nn.Module):
    """Calendar-feature embedding (``Embed.py:63-88``).  x_mark columns:
    [month, day, weekday, hour(, minute)]."""

    d_model: int
    embed_type: str = "fixed"
    freq: str = "h"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sizes = {"month": 13, "day": 32, "weekday": 7, "hour": 24, "minute": 4}

        def make(name, c_in):
            if self.embed_type == "fixed":
                return FixedEmbedding(c_in, self.d_model, name=name)
            return nn.Embed(c_in, self.d_model, name=name)

        xi = x.astype(jnp.int32)
        out = (
            make("month_embed", sizes["month"])(xi[:, :, 0])
            + make("day_embed", sizes["day"])(xi[:, :, 1])
            + make("weekday_embed", sizes["weekday"])(xi[:, :, 2])
            + make("hour_embed", sizes["hour"])(xi[:, :, 3])
        )
        if self.freq == "t":
            out = out + make("minute_embed", sizes["minute"])(xi[:, :, 4])
        return out


class TimeFeatureEmbedding(nn.Module):
    """Linear embedding of real-valued time features (``Embed.py:91-100``)."""

    d_model: int
    freq: str = "h"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.d_model, use_bias=False, name="embed")(x)


class DataEmbedding(nn.Module):
    """token + temporal + positional (``Embed.py:103-117``)."""

    d_model: int
    embed_type: str = "fixed"
    freq: str = "h"
    use_pos: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mark: jnp.ndarray) -> jnp.ndarray:
        out = TokenEmbedding(self.d_model, name="value_embedding")(x)
        if self.embed_type == "timeF":
            out = out + TimeFeatureEmbedding(
                self.d_model, self.freq, name="temporal_embedding")(x_mark)
        else:
            out = out + TemporalEmbedding(
                self.d_model, self.embed_type, self.freq,
                name="temporal_embedding")(x_mark)
        if self.use_pos:
            out = out + PositionalEmbedding(self.d_model,
                                            name="position_embedding")(x)
        return out


class DataEmbeddingWoPos(DataEmbedding):
    """token + temporal only (``DataEmbedding_wo_pos``, ``Embed.py:133-150``)."""

    use_pos: bool = False
