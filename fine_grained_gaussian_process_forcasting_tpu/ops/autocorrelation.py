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
    # Unpacked (four-matrix) layout.  A packed [real|imag] single-GEMM
    # variant (one (L,2F) forward / one (2F,L) inverse) looked better on
    # lane-padding arithmetic but MEASURED WORSE in the full step: the
    # production d512 AutoDG step regressed 41.4 -> 45.2 ms (52.0 -> 47.7%
    # of bf16 peak, uncontended slope-timed A/B on v5e) — XLA schedules the
    # two narrow GEMMs better than the wide one plus the concatenate's
    # extra HBM buffer.  Keep the four mats.
    # numpy constants (NOT jnp): device arrays created inside one trace and
    # cached would leak as tracers into the next
    return (w_r.astype(np.float32), w_i.astype(np.float32),
            inv_r.astype(np.float32), inv_i.astype(np.float32))


def _mm(a, b):
    """GEMM with fp32 accumulation, operands kept in their (possibly bf16)
    dtype so the MXU runs at native rate."""
    return jnp.matmul(a, b, preferred_element_type=jnp.float32)


# Transform routing.  The O(L^2) DFT-as-GEMM wins on the MXU at EVERY
# length this model family reaches — measured fwd+bwd bf16 on v5e
# (scripts/autocorr_fft_ab.py): 3.3 vs 25.2 ms at the production
# (64,8,512,64), 0.36 vs 1.06 ms at (64,8,128,64), 0.22 vs 3.24 ms at
# the flagship (256,8,288,4) — XLA's TPU FFT runs on the VPU and loses
# 3-11x even where the DFT does ~50x the FLOPs.  The FFT path is kept
# only as the measurement baseline (_FORCE_FFT=True in the A/B script).
_FORCE_FFT = None


def _use_fft(L: int) -> bool:
    return bool(_FORCE_FFT)


def _rfft_pair(x2: jnp.ndarray, L: int):
    """rfft of 2-D (rows, L) -> (real, imag) each (rows, L//2+1).

    Carried as a real pair so both transform backends feed the identical
    downstream spectrum arithmetic.  2-D operands keep the XLA CPU
    backend's FFT layout constraint satisfied (tests run on CPU)."""
    if _use_fft(L):
        X = jnp.fft.rfft(x2.astype(jnp.float32), axis=-1)
        return X.real, X.imag
    w_r, w_i, _, _ = _dft_mats(L)
    return _mm(x2, w_r.astype(x2.dtype)), _mm(x2, w_i.astype(x2.dtype))


def _irfft_pair(xr: jnp.ndarray, xi: jnp.ndarray, L: int, dt) -> jnp.ndarray:
    """Inverse of ``_rfft_pair`` on 2-D (rows, L//2+1) spectra -> (rows, L).

    ``dt`` is the GEMM operand dtype for the DFT path (the FFT path runs
    complex64 regardless — XLA's FFT is f32-only)."""
    if _use_fft(L):
        return jnp.fft.irfft(jax.lax.complex(xr.astype(jnp.float32),
                                             xi.astype(jnp.float32)),
                             n=L, axis=-1)
    _, _, inv_r, inv_i = _dft_mats(L)
    return (_mm(xr.astype(dt), inv_r.astype(dt))
            + _mm(xi.astype(dt), inv_i.astype(dt)))


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

    # v and the impulse train go to frequency space (DFT-as-GEMM on the
    # MXU — see the routing note above _FORCE_FFT), conj-multiply,
    # inverse-transform.
    dt = values.dtype
    v2 = values.reshape(-1, L)
    vr, vi = _rfft_pair(v2, L)
    vr = vr.reshape(b_, h_ * d_, -1)
    vi = vi.reshape(b_, h_ * d_, -1)
    fr, fi = _rfft_pair(f, L)
    fr, fi = fr[:, None, :], fi[:, None, :]
    # (vr + i vi) * conj(fr + i fi)
    pr = (vr * fr + vi * fi)
    pi = (vi * fr - vr * fi)
    out = _irfft_pair(pr.reshape(-1, pr.shape[-1]),
                      pi.reshape(-1, pi.shape[-1]), L, dt)
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
    dt = qt.dtype
    q2 = qt.reshape(-1, L)
    k2 = kt.reshape(-1, L)
    qr, qi = _rfft_pair(q2, L)
    kr, ki = _rfft_pair(k2, L)
    qr, qi = qr.reshape(b, h * d, -1), qi.reshape(b, h * d, -1)
    kr, ki = kr.reshape(b, h * d, -1), ki.reshape(b, h * d, -1)
    # mean over (h, d) of (q + i qi) * conj(k + i ki)
    res_r = jnp.mean(qr * kr + qi * ki, axis=1)  # (b, F)
    res_i = jnp.mean(qi * kr - qr * ki, axis=1)
    mean_value = _irfft_pair(res_r, res_i, L, jnp.float32)  # (b, L)

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
