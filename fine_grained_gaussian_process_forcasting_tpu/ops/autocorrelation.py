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


def _delay_aggregate(
    values: jnp.ndarray, delays: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted sum of left-rolls:  out[..., t] = sum_i w_i v[..., (t+d_i)%L].

    values: (b, h, d, L); delays: (k,) shared or (b, k) per-sample;
    weights: (b, k).  Equivalent to the reference's roll/gather loops
    (``Autoformer.py:48-52,76-81``) but computed as a circular correlation
    with the sparse weight impulse train f (f[d_i] = w_i):

        out = irfft( rfft(v) * conj(rfft(f)) )

    — TPU gathers along the minor (lane) dimension serialize badly; this
    formulation replaces them with two small FFTs and elementwise work
    (measured ~3x faster end-to-end on the AutoDG train step).
    """
    b = values.shape[0]
    L = values.shape[-1]
    f = jnp.zeros((b, L), dtype=jnp.float32)
    if delays.ndim == 1:  # shared delays (training agg)
        f = f.at[:, delays].add(weights.astype(jnp.float32))
    else:  # per-sample delays (inference agg)
        bi = jnp.arange(b)[:, None]
        f = f.at[bi, delays].add(weights.astype(jnp.float32))
    # 2-D collapsed FFT operands (see the layout note in auto_correlation)
    b_, h_, d_, _ = values.shape
    v_fft = jnp.fft.rfft(
        values.astype(jnp.float32).reshape(-1, L), axis=-1
    ).reshape(b_, h_, d_, -1)
    f_fft = jnp.fft.rfft(f, axis=-1)[:, None, None, :]
    out = jnp.fft.irfft(
        (v_fft * jnp.conj(f_fft)).reshape(-1, v_fft.shape[-1]), n=L, axis=-1
    ).reshape(b_, h_, d_, L)
    return out.astype(values.dtype)


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

    Returns (context, mean correlation over heads/channels (b, L)) — the
    full (b, h, d, L) correlation tensor the reference carries is never
    consumed beyond this mean (see the restructuring note below).
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
    #
    # TPU-first restructurings of the reference's corr pipeline
    # (``Autoformer.py:115-118``):
    # - non-power-of-two FFT lengths (the datasets' 192/240/384) hit slow
    #   mixed-radix paths; compute the circular-L correlation exactly from
    #   zero-padded power-of-two FFTs via the wrap-around fold
    #   corr_L[l] = c_N[l] + c_N[N-L+l];
    # - only the (head, channel)-MEAN of the correlation is ever consumed
    #   (``Autoformer.py:40-41,68-69``), and the mean commutes with the
    #   inverse FFT — so average the spectra first and inverse-transform
    #   (b, nfft) instead of (b*h*d, nfft): 32x less irfft work forward
    #   and backward.
    nfft = 1 << (2 * L - 1).bit_length()

    def _rfft(x):
        flat = x.astype(jnp.float32).reshape(-1, L)
        return jnp.fft.rfft(flat, n=nfft, axis=-1)

    res = _rfft(qt) * jnp.conj(_rfft(kt))
    res_mean = jnp.mean(res.reshape(b, h * d, -1), axis=1)  # (b, nfft//2+1)
    c_n = jnp.fft.irfft(res_mean, n=nfft, axis=-1)
    if nfft == L:
        mean_value = c_n
    else:
        mean_value = c_n[:, :L] + c_n[:, nfft - L:]  # (b, L)

    top_k = int(factor * math.log(L))

    if training:
        # Delays shared across the batch: top-k of the batch-mean correlation.
        _, index = jax.lax.top_k(jnp.mean(mean_value, axis=0), top_k)  # (k,)
        weights = mean_value[:, index]  # (b, k)
        tmp_corr = jax.nn.softmax(weights, axis=-1)
        agg = _delay_aggregate(vt, index, tmp_corr)
    else:
        weights, delay = jax.lax.top_k(mean_value, top_k)  # (b, k)
        tmp_corr = jax.nn.softmax(weights, axis=-1)
        agg = _delay_aggregate(vt, delay, tmp_corr)

    context = agg.transpose(0, 1, 3, 2)  # back to (b, h, L, d)
    return context, mean_value
