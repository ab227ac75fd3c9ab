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

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _dft_mats(L: int):
    """Real DFT / inverse-DFT matrices for length-L circular transforms.

    At this model family's sequence lengths (L <= 384) the O(L^2) DFT as
    two GEMMs runs on the MXU and beats XLA's TPU FFT path (which executes
    on the VPU) by a wide margin — the classic small-L TPU trade.  rfft
    convention: X[f] = sum_t x[t] e^{-2pi i t f / L}, f in [0, L//2].
    """
    F = L // 2 + 1
    t = np.arange(L)[:, None]
    f = np.arange(F)[None, :]
    ang = 2.0 * np.pi * t * f / L
    w_r = np.cos(ang)
    w_i = -np.sin(ang)
    # inverse: x[t] = (1/L) * sum_f w_f (Xr cos + Xi' sin...) with w_f = 1
    # for f=0 and (even L) f=L/2, else 2 — the real-signal irfft identity.
    weights = np.full(F, 2.0)
    weights[0] = 1.0
    if L % 2 == 0:
        weights[-1] = 1.0
    inv_r = (np.cos(ang) * weights[None, :] / L).T  # (F, L)
    inv_i = (-np.sin(ang) * weights[None, :] / L).T
    # numpy constants (NOT jnp): device arrays created inside one trace and
    # cached would leak as tracers into the next
    return (w_r.astype(np.float32), w_i.astype(np.float32),
            inv_r.astype(np.float32), inv_i.astype(np.float32))


def _mm(a, b):
    """GEMM with fp32 accumulation, operands kept in their (possibly bf16)
    dtype so the MXU runs at native rate."""
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


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
    b_, h_, d_, L = values.shape
    f = jnp.zeros((b_, L), dtype=jnp.float32)
    if delays.ndim == 1:  # shared delays (training agg)
        f = f.at[:, delays].add(weights.astype(jnp.float32))
    else:  # per-sample delays (inference agg)
        bi = jnp.arange(b_)[:, None]
        f = f.at[bi, delays].add(weights.astype(jnp.float32))

    # DFT-as-GEMM (see _dft_mats): v and the impulse train go to frequency
    # space with two (L x F) matmuls each, conj-multiply, inverse with two
    # (F x L) matmuls — all MXU work, no VPU FFT.
    w_r, w_i, inv_r, inv_i = _dft_mats(L)
    dt = values.dtype
    v2 = values.reshape(-1, L)
    vr = _mm(v2, w_r.astype(dt)).reshape(b_, h_ * d_, -1)
    vi = _mm(v2, w_i.astype(dt)).reshape(b_, h_ * d_, -1)
    fr = _mm(f, w_r)[:, None, :]
    fi = _mm(f, w_i)[:, None, :]
    # (vr + i vi) * conj(fr + i fi)
    pr = (vr * fr + vi * fi).astype(dt)
    pi = (vi * fr - vr * fi).astype(dt)
    out = (_mm(pr.reshape(-1, pr.shape[-1]), inv_r.astype(dt))
           + _mm(pi.reshape(-1, pi.shape[-1]), inv_i.astype(dt)))
    return out.reshape(b_, h_, d_, L).astype(values.dtype)


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

    # TPU-first restructurings of the reference's corr pipeline
    # (``Autoformer.py:115-118``):
    # - the transforms are DFT-as-GEMM (``_dft_mats``): at L <= 384 the
    #   O(L^2) matmul runs on the MXU and beats the VPU FFT path (measured
    #   8.6 -> ~3 ms on the no-denoise AutoDG step vs the round-1
    #   pow2-padded FFT implementation);
    # - only the (head, channel)-MEAN of the correlation is ever consumed
    #   (``Autoformer.py:40-41,68-69``), and the mean commutes with the
    #   inverse transform — so average the spectra first and
    #   inverse-transform (b, F) instead of (b*h*d, F);
    # - the L-point DFT product gives the exact circular-L correlation the
    #   reference's length-L rfft computes, with no padding.
    w_r, w_i, inv_r, inv_i = _dft_mats(L)
    dt = qt.dtype
    q2 = qt.reshape(-1, L)
    k2 = kt.reshape(-1, L)
    qr = _mm(q2, w_r.astype(dt)).reshape(b, h * d, -1)
    qi = _mm(q2, w_i.astype(dt)).reshape(b, h * d, -1)
    kr = _mm(k2, w_r.astype(dt)).reshape(b, h * d, -1)
    ki = _mm(k2, w_i.astype(dt)).reshape(b, h * d, -1)
    # mean over (h, d) of (q + i qi) * conj(k + i ki)
    res_r = jnp.mean(qr * kr + qi * ki, axis=1)  # (b, F)
    res_i = jnp.mean(qi * kr - qr * ki, axis=1)
    mean_value = _mm(res_r, inv_r) + _mm(res_i, inv_i)  # (b, L)

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
