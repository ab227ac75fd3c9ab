"""Fourier-domain blocks (FEDformer).

Re-design of ``layers/FourierCorrelation.py:10-126``: rFFT -> keep a static
subset of frequency modes -> complex per-mode linear map -> irFFT.  Complex
weights are stored as separate real/imag params (TPU matmuls are real; at 8
modes this path is negligible FLOPs either way).  The per-mode Python loops
become one einsum over a gathered mode axis.

Mode indices are chosen host-side at module construction (numpy shuffle
under ``seed``), exactly like the reference's ``get_frequency_modes``
(``FourierCorrelation.py:10-24``), so they are static at trace time.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def get_frequency_modes(
    seq_len: int, modes: int = 64, mode_select_method: str = "random",
    seed: int = 0,
) -> List[int]:
    """Static frequency-mode index selection (``FourierCorrelation.py:10-24``)."""
    modes = min(modes, seq_len // 2)
    if mode_select_method == "random":
        rng = np.random.RandomState(seed)
        index = list(range(0, seq_len // 2))
        rng.shuffle(index)
        index = index[:modes]
    else:
        index = list(range(0, modes))
    index.sort()
    return index


class FourierBlock(nn.Module):
    """Frequency-domain representation learning on Q
    (``FourierCorrelation.py:28-62``).

    Input (b, l, h, e); output (b, l, h, e).  The reference returns the
    (b, h, e, l) tensor and lets a ``view`` scramble it back
    (``layers/AutoCorrelation.py:175``); we transpose properly (documented
    behavioral delta).
    """

    in_channels: int
    out_channels: int
    seq_len: int
    modes: int = 0
    mode_select_method: str = "random"
    n_heads: int = 8
    seed: int = 0

    def setup(self):
        self.index = get_frequency_modes(
            self.seq_len, self.modes, self.mode_select_method, self.seed
        )
        h = self.n_heads
        in_c, out_c = self.in_channels // h, self.out_channels // h
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (h, in_c, out_c, len(self.index))
        init = lambda key, s: scale * jax.random.uniform(key, s)
        self.w_real = self.param("w_real", init, shape)
        self.w_imag = self.param("w_imag", init, shape)

    def __call__(self, q, k=None, v=None, mask=None) -> Tuple[jnp.ndarray, None]:
        b, l, h, e = q.shape
        x = q.transpose(0, 2, 3, 1)  # (b, h, e, l)
        x_ft = jnp.fft.rfft(x.astype(jnp.float32), axis=-1)
        idx = jnp.asarray(self.index)
        x_sel = x_ft[..., idx]  # (b, h, e, M)
        w = self.w_real + 1j * self.w_imag
        out_sel = jnp.einsum("bhim,hiom->bhom", x_sel, w.astype(x_sel.dtype))
        n_freq = l // 2 + 1
        out_ft = jnp.zeros((b, h, out_sel.shape[2], n_freq), dtype=out_sel.dtype)
        # The reference writes selected modes to *compacted* slots 0..M-1
        # (``FourierCorrelation.py:59``) — replicated.
        out_ft = out_ft.at[..., : len(self.index)].set(out_sel)
        out = jnp.fft.irfft(out_ft, n=l, axis=-1)  # (b, h, e, l)
        return out.transpose(0, 3, 1, 2).astype(q.dtype), None


class FourierCrossAttention(nn.Module):
    """Cross attention in mode space (``FourierCorrelation.py:66-126``)."""

    in_channels: int
    out_channels: int
    seq_len_q: int
    seq_len_kv: int
    modes: int = 64
    mode_select_method: str = "random"
    activation: str = "tanh"
    n_heads: int = 8
    seed: int = 0

    def setup(self):
        self.index_q = get_frequency_modes(
            self.seq_len_q, self.modes, self.mode_select_method, self.seed
        )
        self.index_kv = get_frequency_modes(
            self.seq_len_kv, self.modes, self.mode_select_method, self.seed + 1
        )
        h = self.n_heads
        in_c, out_c = self.in_channels // h, self.out_channels // h
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (h, in_c, out_c, len(self.index_q))
        init = lambda key, s: scale * jax.random.uniform(key, s)
        self.w_real = self.param("w_real", init, shape)
        self.w_imag = self.param("w_imag", init, shape)

    def __call__(self, q, k, v=None, mask=None) -> Tuple[jnp.ndarray, None]:
        b, l, h, e = q.shape
        xq = q.transpose(0, 2, 3, 1)  # (b, h, e, l)
        xk = k.transpose(0, 2, 3, 1)

        xq_ft = jnp.fft.rfft(xq.astype(jnp.float32), axis=-1)[
            ..., jnp.asarray(self.index_q)
        ]
        xk_ft = jnp.fft.rfft(xk.astype(jnp.float32), axis=-1)[
            ..., jnp.asarray(self.index_kv)
        ]

        xqk_ft = jnp.einsum("bhex,bhey->bhxy", xq_ft, xk_ft)
        if self.activation == "tanh":
            xqk_ft = jnp.tanh(xqk_ft)  # complex tanh, matching torch
        elif self.activation == "softmax":
            w = jax.nn.softmax(jnp.abs(xqk_ft), axis=-1)
            xqk_ft = w.astype(jnp.complex64)
        else:
            raise ValueError(f"{self.activation} activation is not implemented")
        xqkv_ft = jnp.einsum("bhxy,bhey->bhex", xqk_ft, xk_ft)
        w_c = (self.w_real + 1j * self.w_imag).astype(xqkv_ft.dtype)
        xqkvw = jnp.einsum("bhex,heox->bhox", xqkv_ft, w_c)

        n_freq = l // 2 + 1
        out_ft = jnp.zeros((b, h, xqkvw.shape[2], n_freq), dtype=xqkvw.dtype)
        out_ft = out_ft.at[..., jnp.asarray(self.index_q)].set(xqkvw)
        out = jnp.fft.irfft(
            out_ft / self.in_channels / self.out_channels, n=l, axis=-1
        )
        return out.transpose(0, 3, 1, 2).astype(q.dtype), None
