"""AutoCorrelation (Autoformer) — FFT period discovery + time-delay agg.

Re-design of ``forecasting_models/Autoformer.py:9-131`` (and its copy
``layers/AutoCorrelation.py:19-141``).  O(L log L) via rFFT; the top-k delay
count is static at trace time (``int(factor*log(L))`` with L a Python int),
so everything jits with fixed shapes.  The per-delay ``torch.roll`` loop
becomes one batched modular gather + weighted sum (einsum on the MXU).

Layout convention: all ops in this package take (batch, heads, length, d)
and return (context, aux).  The reference's dispatcher transposes to
(b, l, h, d) and back with a reshape that interleaves heads into the
sequence (``modules/multi_head_attention.py:60-62,90``); we keep the clean
layout throughout (documented behavioral delta).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _delay_gather(values: jnp.ndarray, delays: jnp.ndarray) -> jnp.ndarray:
    """Roll ``values`` (..., L) left by each delay.

    values: (b, h, d, L); delays: (k,) or (b, k) integer delays.
    Returns (b, h, d, k, L) where out[..., i, t] = values[..., (t+delay_i) % L].
    Equivalent to the reference's roll/gather loops
    (``Autoformer.py:48-52,76-81``).
    """
    L = values.shape[-1]
    t = jnp.arange(L)
    if delays.ndim == 1:  # shared delays (training agg)
        idx = (t[None, :] + delays[:, None]) % L  # (k, L)
        return values[..., idx]  # (b, h, d, k, L)
    # per-sample delays (inference agg): delays (b, k)
    idx = (t[None, None, :] + delays[:, :, None]) % L  # (b, k, L)
    return jnp.take_along_axis(
        values[:, :, :, None, :], idx[:, None, None, :, :], axis=-1
    )


def auto_correlation(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    factor: int = 1,
    training: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """AutoCorrelation attention over (b, h, l, d) operands.

    training=True  -> batch-shared delay discovery (``Autoformer.py:31-54``)
    training=False -> per-sample delays            (``Autoformer.py:56-81``)
    """
    b, h, L, d = q.shape
    S = k.shape[2]
    if L > S:
        pad = jnp.zeros((b, h, L - S, d), dtype=q.dtype)
        k = jnp.concatenate([k, pad], axis=2)
        v = jnp.concatenate([v, pad], axis=2)
    else:
        k = k[:, :, :L, :]
        v = v[:, :, :L, :]

    # (b, h, d, L) time-major-last for the FFT.
    qt = q.transpose(0, 1, 3, 2)
    kt = k.transpose(0, 1, 3, 2)
    vt = v.transpose(0, 1, 3, 2)

    # FFTs over collapsed 2-D operands: XLA's CPU fft thunk requires a
    # dim0-major layout, which higher-rank transposed operands are not
    # guaranteed to keep inside a large fused graph.
    def _rfft(x):
        flat = x.astype(jnp.float32).reshape(-1, L)
        return jnp.fft.rfft(flat, axis=-1)

    res = _rfft(qt) * jnp.conj(_rfft(kt))
    corr = jnp.fft.irfft(res, n=L, axis=-1).reshape(b, h, d, L)

    top_k = int(factor * math.log(L))
    mean_value = jnp.mean(corr, axis=(1, 2))  # (b, L)

    if training:
        # Delays shared across the batch: top-k of the batch-mean correlation.
        _, index = jax.lax.top_k(jnp.mean(mean_value, axis=0), top_k)  # (k,)
        weights = mean_value[:, index]  # (b, k)
        tmp_corr = jax.nn.softmax(weights, axis=-1)
        rolled = _delay_gather(vt, index)  # (b,h,d,k,L)
    else:
        weights, delay = jax.lax.top_k(mean_value, top_k)  # (b, k)
        tmp_corr = jax.nn.softmax(weights, axis=-1)
        rolled = _delay_gather(vt, delay)

    agg = jnp.einsum(
        "bhdkl,bk->bhdl", rolled, tmp_corr.astype(rolled.dtype),
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    context = agg.transpose(0, 1, 3, 2)  # back to (b, h, L, d)
    return context, corr
