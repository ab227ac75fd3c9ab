"""Multiwavelet transform / cross-attention blocks (FEDformer 'Wavelets').

Re-design of ``layers/MultiWaveletCorrelation.py:20-380``: recursive
even/odd wavelet decomposition with the Alpert filter banks from
``wavelet_filters.py`` (host-side precompute), a sparse frequency-domain
kernel per scale, and even/odd reconstruction.  The recursion depth
``ns - L`` is a Python int at trace time (sequence lengths are static), so
the whole pyramid unrolls into one fused XLA program of matmuls + FFTs.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.ops.wavelet_filters import (
    filter_bank,
)


def _build_filters(base: str, k: int):
    """(ec_s, ec_d, rc_e, rc_o) as float32 arrays (matching the reference's
    registered buffers, ``MultiWaveletCorrelation.py:105-115``)."""
    H0, H1, G0, G1, PHI0, PHI1 = filter_bank(base, k)
    H0r, G0r = H0 @ PHI0, G0 @ PHI0
    H1r, G1r = H1 @ PHI1, G1 @ PHI1
    for m in (H0r, H1r, G0r, G1r):
        m[np.abs(m) < 1e-8] = 0.0
    ec_s = np.concatenate([H0.T, H1.T], axis=0).astype(np.float32)
    ec_d = np.concatenate([G0.T, G1.T], axis=0).astype(np.float32)
    rc_e = np.concatenate([H0r, G0r], axis=0).astype(np.float32)
    rc_o = np.concatenate([H1r, G1r], axis=0).astype(np.float32)
    return ec_s, ec_d, rc_e, rc_o


def _wavelet_transform(x: jnp.ndarray, ec_s, ec_d):
    """One decomposition level: (B, N, c, k) -> (d, s) each (B, N/2, c, k)."""
    xa = jnp.concatenate([x[:, ::2], x[:, 1::2]], axis=-1)  # (B, N/2, c, 2k)
    return xa @ ec_d, xa @ ec_s


def _even_odd(x: jnp.ndarray, rc_e, rc_o, k: int):
    """One reconstruction level: (B, N, c, 2k) -> (B, 2N, c, k)."""
    B, N, c, _ = x.shape
    x_e = x @ rc_e
    x_o = x @ rc_o
    out = jnp.zeros((B, N * 2, c, k), dtype=x.dtype)
    out = out.at[:, ::2].set(x_e)
    out = out.at[:, 1::2].set(x_o)
    return out


def _pad_pow2(x: jnp.ndarray, n: int) -> Tuple[jnp.ndarray, int, int]:
    """Pad the length axis to the next power of two by repeating the head
    (the reference's ``extra_x = x[:, 0:nl-N]`` trick)."""
    ns = math.floor(np.log2(n))
    nl = 2 ** math.ceil(np.log2(n))
    if nl > n:
        x = jnp.concatenate([x, x[:, : nl - n]], axis=1)
    return x, ns


class SparseKernelFT(nn.Module):
    """Frequency-domain kernel: rfft -> lowest-``alpha`` modes complex
    matmul -> irfft (``sparseKernelFT1d``, ``MultiWaveletCorrelation.py:
    263-293``)."""

    k: int
    alpha: int
    c: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, c, k = x.shape
        ck = c * k
        scale = 1.0 / (ck * ck)
        init = lambda key, s: scale * jax.random.uniform(key, s)
        w_r = self.param("w_real", init, (ck, ck, self.alpha))
        w_i = self.param("w_imag", init, (ck, ck, self.alpha))

        xf = x.reshape(B, N, ck).transpose(0, 2, 1)  # (B, ck, N)
        x_fft = jnp.fft.rfft(xf.astype(jnp.float32), axis=-1)
        l = min(self.alpha, N // 2 + 1)
        w = (w_r + 1j * w_i).astype(x_fft.dtype)
        out_modes = jnp.einsum("bix,iox->box", x_fft[:, :, :l], w[:, :, :l])
        out_ft = jnp.zeros((B, ck, N // 2 + 1), dtype=x_fft.dtype)
        out_ft = out_ft.at[:, :, :l].set(out_modes)
        out = jnp.fft.irfft(out_ft, n=N, axis=-1)
        return out.transpose(0, 2, 1).reshape(B, N, c, k).astype(x.dtype)


class MWTCZ(nn.Module):
    """One multiwavelet Cheng-Zhang block (``MWT_CZ1d``,
    ``MultiWaveletCorrelation.py:296-380``): decompose ns-L levels, apply
    sparse FT kernels A/B/C per level + linear T0 at the coarsest scale,
    reconstruct."""

    k: int = 8
    alpha: int = 16
    L: int = 0
    c: int = 1
    base: str = "legendre"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ec_s, ec_d, rc_e, rc_o = (jnp.asarray(m) for m in
                                  _build_filters(self.base, self.k))
        B, N, c, k = x.shape
        x, ns = _pad_pow2(x, N)

        A = SparseKernelFT(self.k, self.alpha, self.c, name="A")
        Bm = SparseKernelFT(self.k, self.alpha, self.c, name="B")
        C = SparseKernelFT(self.k, self.alpha, self.c, name="C")
        T0 = nn.Dense(self.k, name="T0")

        Ud: List[jnp.ndarray] = []
        Us: List[jnp.ndarray] = []
        for _ in range(ns - self.L):
            d, x = _wavelet_transform(x, ec_s, ec_d)
            Ud.append(A(d) + Bm(x))
            Us.append(C(d))
        x = T0(x)
        for i in range(ns - 1 - self.L, -1, -1):
            x = x + Us[i]
            x = jnp.concatenate([x, Ud[i]], axis=-1)
            x = _even_odd(x, rc_e, rc_o, self.k)
        return x[:, :N]


class MultiWaveletTransform(nn.Module):
    """Self-attention stand-in (``MultiWaveletTransform``,
    ``MultiWaveletCorrelation.py:20-58``).  Interface: (q, k, v, mask) with
    (B, L, H, E) operands; only v is used."""

    ich: int
    k: int = 8
    alpha: int = 16
    c: int = 128
    nCZ: int = 1
    L: int = 0
    base: str = "legendre"

    @nn.compact
    def __call__(self, queries, keys, values, mask=None):
        B, L, H, E = queries.shape
        _, S, _, D = values.shape
        if L > S:
            zeros = jnp.zeros((B, L - S, H, D), values.dtype)
            values = jnp.concatenate([values, zeros], axis=1)
        else:
            values = values[:, :L]
        v = values.reshape(B, L, -1)
        v = nn.Dense(self.c * self.k, name="Lk0")(v).reshape(B, L, self.c, self.k)
        for i in range(self.nCZ):
            v = MWTCZ(self.k, self.alpha, self.L, self.c, self.base,
                      name=f"mwt_cz{i}")(v)
            if i < self.nCZ - 1:
                v = nn.relu(v)
        v = nn.Dense(self.ich, name="Lk1")(v.reshape(B, L, -1))
        return v.reshape(B, L, -1, D), None


class FourierCrossAttentionW(nn.Module):
    """Weightless mode-space cross attention used inside the wavelet cross
    block (``FourierCrossAttentionW``, ``MultiWaveletCorrelation.py:
    213-260``).  Operands (B, N, c, k); modes are the lowest frequencies."""

    in_channels: int
    out_channels: int
    modes: int = 16
    activation: str = "tanh"

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        B, L, E, H = q.shape
        xq = q.transpose(0, 3, 2, 1)  # (B, H, E, L)
        xk = k.transpose(0, 3, 2, 1)
        mq = min(L // 2, self.modes)
        mkv = min(v.shape[1] // 2, self.modes)

        xq_ft = jnp.fft.rfft(xq.astype(jnp.float32), axis=-1)[..., :mq]
        xk_ft = jnp.fft.rfft(xk.astype(jnp.float32), axis=-1)[..., :mkv]
        xqk_ft = jnp.einsum("bhex,bhey->bhxy", xq_ft, xk_ft)
        if self.activation == "tanh":
            xqk_ft = jnp.tanh(xqk_ft)
        elif self.activation == "softmax":
            w = jax.nn.softmax(jnp.abs(xqk_ft), axis=-1)
            xqk_ft = w.astype(jnp.complex64)
        else:
            raise ValueError(f"{self.activation} activation not implemented")
        xqkv_ft = jnp.einsum("bhxy,bhey->bhex", xqk_ft, xk_ft)
        out_ft = jnp.zeros((B, H, E, L // 2 + 1), dtype=xqkv_ft.dtype)
        out_ft = out_ft.at[..., :mq].set(xqkv_ft)
        out = jnp.fft.irfft(
            out_ft / self.in_channels / self.out_channels, n=L, axis=-1)
        return out.transpose(0, 3, 2, 1).astype(q.dtype), None


class MultiWaveletCross(nn.Module):
    """Cross attention in the wavelet domain (``MultiWaveletCross``,
    ``MultiWaveletCorrelation.py:61-211``)."""

    in_channels: int
    out_channels: int
    modes: int
    ich: int = 512
    k: int = 8
    c: int = 64
    L: int = 0
    base: str = "legendre"
    activation: str = "tanh"

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        B, N, H, E = q.shape
        _, S, _, _ = k.shape
        ec_s, ec_d, rc_e, rc_o = (jnp.asarray(m) for m in
                                  _build_filters(self.base, self.k))

        q = nn.Dense(self.c * self.k, name="Lq")(q.reshape(B, N, -1))
        k = nn.Dense(self.c * self.k, name="Lk")(k.reshape(B, S, -1))
        v = nn.Dense(self.c * self.k, name="Lv")(v.reshape(B, S, -1))
        q = q.reshape(B, N, self.c, self.k)
        k = k.reshape(B, S, self.c, self.k)
        v = v.reshape(B, S, self.c, self.k)

        if N > S:
            zeros = jnp.zeros((B, N - S, self.c, self.k), q.dtype)
            k = jnp.concatenate([k, zeros], axis=1)
            v = jnp.concatenate([v, zeros], axis=1)
        else:
            k, v = k[:, :N], v[:, :N]

        q, ns = _pad_pow2(q, N)
        k, _ = _pad_pow2(k, N)
        v, _ = _pad_pow2(v, N)

        attn_kw = dict(in_channels=self.in_channels,
                       out_channels=self.out_channels, modes=self.modes,
                       activation=self.activation)
        attn1 = FourierCrossAttentionW(**attn_kw, name="attn1")
        attn2 = FourierCrossAttentionW(**attn_kw, name="attn2")
        attn3 = FourierCrossAttentionW(**attn_kw, name="attn3")
        attn4 = FourierCrossAttentionW(**attn_kw, name="attn4")

        Ud, Us = [], []
        dq_list, dk_list, dv_list = [], [], []
        sq, sk, sv = q, k, v
        for _ in range(ns - self.L):
            dq, sq = _wavelet_transform(sq, ec_s, ec_d)
            dk, sk = _wavelet_transform(sk, ec_s, ec_d)
            dv, sv = _wavelet_transform(sv, ec_s, ec_d)
            dq_list.append((dq, sq))
            dk_list.append((dk, sk))
            dv_list.append((dv, sv))
        for (dq, sq_i), (dk, sk_i), (dv, sv_i) in zip(dq_list, dk_list, dv_list):
            Ud.append(attn1(dq, dk, dv, mask)[0] + attn2(sq_i, sk_i, sv_i, mask)[0])
            Us.append(attn3(dq, dk, dv, mask)[0])
        v_out = attn4(sq, sk, sv, mask)[0]

        for i in range(ns - 1 - self.L, -1, -1):
            v_out = v_out + Us[i]
            v_out = jnp.concatenate([v_out, Ud[i]], axis=-1)
            v_out = _even_odd(v_out, rc_e, rc_o, self.k)
        out = nn.Dense(self.ich, name="out")(v_out[:, :N].reshape(B, N, -1))
        return out.reshape(B, N, H, -1), None
