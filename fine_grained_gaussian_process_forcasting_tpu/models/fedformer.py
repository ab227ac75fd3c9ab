"""FEDformer: frequency-enhanced decomposed transformer.

Re-design of ``forecasting_models/FedFormer.py:17-141`` and the
progressive-decomposition stack in ``layers/Autoformer_EncDec.py:85-219``:
seasonal/trend decomposition drives the decoder init, every layer
re-decomposes after attention/FFN, and trends accumulate through the
decoder.  Inner correlations: Fourier blocks ('Fourier'), multiwavelet
blocks ('Wavelets'), AutoCorrelation ('Autoformer') or plain attention.

Behavioral delta (documented): the reference's FEDformer is unrunnable
as-is (its ``layers/SelfAttention_Family.py:10`` imports a module that
does not exist); this build fixes the capability.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.ops.autocorrelation import (
    auto_correlation,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.decomposition import (
    MyLayerNorm,
    SeriesDecompMulti,
    series_decomp,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.fourier import (
    FourierBlock,
    FourierCrossAttention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.full_attention import (
    full_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.wavelet import (
    MultiWaveletCross,
    MultiWaveletTransform,
)
from fine_grained_gaussian_process_forcasting_tpu.models.embedding import (
    DataEmbeddingWoPos,
)


@dataclasses.dataclass(frozen=True)
class FEDformerConfig:
    """Mirror of the reference's ``configs`` object
    (``FedFormer.py:146-183``)."""

    enc_in: int = 7
    dec_in: int = 7
    c_out: int = 7
    seq_len: int = 96
    label_len: int = 48
    pred_len: int = 96
    d_model: int = 16
    n_heads: int = 8
    d_ff: int = 16
    e_layers: int = 2
    d_layers: int = 1
    moving_avg: Union[int, Sequence[int]] = (24,)
    version: str = "Fourier"  # 'Fourier' | 'Wavelets' | 'Autoformer'
    mode_select: str = "random"
    modes: int = 64
    L: int = 3
    base: str = "legendre"
    cross_activation: str = "tanh"
    embed: str = "timeF"
    freq: str = "h"
    activation: str = "gelu"
    output_attention: bool = False
    wavelet_k: int = 8


class _Decomp(nn.Module):
    kernel: Union[int, Sequence[int]]

    @nn.compact
    def __call__(self, x):
        if isinstance(self.kernel, int):
            return series_decomp(x, self.kernel)
        if len(self.kernel) == 1:
            return series_decomp(x, self.kernel[0])
        return SeriesDecompMulti(tuple(self.kernel))(x)


class CorrelationLayer(nn.Module):
    """Q/K/V/out projections around an inner correlation op
    (``layers/AutoCorrelation.py:144-176``).  The reference reshapes the
    (B,H,E,L) inner output with a raw ``view`` (``:175``), interleaving
    heads into time; here layouts stay consistent (documented delta)."""

    inner: str  # 'fourier_self' | 'fourier_cross' | 'wavelet_self' |
    # 'wavelet_cross' | 'autocorrelation' | 'full'
    d_model: int
    n_heads: int
    config: FEDformerConfig
    seq_len_q: int = 0
    seq_len_kv: int = 0

    @nn.compact
    def __call__(self, queries, keys, values, mask=None):
        B, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        cfg = self.config

        q = nn.Dense(self.d_model, name="query_projection")(queries)
        k = nn.Dense(self.d_model, name="key_projection")(keys)
        v = nn.Dense(self.d_model, name="value_projection")(values)
        q = q.reshape(B, L, H, -1)
        k = k.reshape(B, S, H, -1)
        v = v.reshape(B, S, H, -1)

        if self.inner == "fourier_self":
            out, attn = FourierBlock(
                in_channels=self.d_model, out_channels=self.d_model,
                seq_len=self.seq_len_q, modes=cfg.modes,
                mode_select_method=cfg.mode_select, n_heads=H,
                name="block")(q, k, v, mask)
        elif self.inner == "fourier_cross":
            out, attn = FourierCrossAttention(
                in_channels=self.d_model, out_channels=self.d_model,
                seq_len_q=self.seq_len_q, seq_len_kv=self.seq_len_kv,
                modes=cfg.modes, mode_select_method=cfg.mode_select,
                activation=cfg.cross_activation, n_heads=H,
                name="block")(q, k, v, mask)
        elif self.inner == "wavelet_self":
            out, attn = MultiWaveletTransform(
                ich=self.d_model, k=cfg.wavelet_k, L=cfg.L, base=cfg.base,
                name="block")(q, k, v, mask)
        elif self.inner == "wavelet_cross":
            out, attn = MultiWaveletCross(
                in_channels=self.d_model, out_channels=self.d_model,
                modes=cfg.modes, ich=self.d_model, k=cfg.wavelet_k,
                L=cfg.L, base=cfg.base, activation=cfg.cross_activation,
                name="block")(q, k, v, mask)
        elif self.inner == "autocorrelation":
            ctx, attn = auto_correlation(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), training=True)
            out = ctx.transpose(0, 2, 1, 3)
        else:
            out, attn = full_attention(q, k, v, mask_flag=bool(mask))

        out = out.reshape(B, L, -1)
        return nn.Dense(self.d_model, name="out_projection")(out), attn


class FEDEncoderLayer(nn.Module):
    """Progressive-decomposition encoder layer
    (``Autoformer_EncDec.py:85-118``)."""

    config: FEDformerConfig
    inner: str

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.config
        new_x, attn = CorrelationLayer(
            inner=self.inner, d_model=cfg.d_model, n_heads=cfg.n_heads,
            config=cfg, seq_len_q=cfg.seq_len, seq_len_kv=cfg.seq_len,
            name="attention")(x, x, x, mask)
        x = x + new_x
        x, _ = _Decomp(cfg.moving_avg, name="decomp1")(x)
        y = nn.Dense(cfg.d_ff, use_bias=False, name="conv1")(x)
        y = nn.gelu(y) if cfg.activation == "gelu" else nn.relu(y)
        y = nn.Dense(cfg.d_model, use_bias=False, name="conv2")(y)
        res, _ = _Decomp(cfg.moving_avg, name="decomp2")(x + y)
        return res, attn


class FEDDecoderLayer(nn.Module):
    """Progressive-decomposition decoder layer with trend extraction
    (``Autoformer_EncDec.py:149-198``)."""

    config: FEDformerConfig

    @nn.compact
    def __call__(self, x, cross, mask=None):
        cfg = self.config
        dec_q_len = cfg.seq_len // 2 + cfg.pred_len
        self_inner = ("wavelet_self" if cfg.version == "Wavelets"
                      else "fourier_self" if cfg.version == "Fourier"
                      else "autocorrelation")
        cross_inner = ("wavelet_cross" if cfg.version == "Wavelets"
                       else "fourier_cross" if cfg.version == "Fourier"
                       else "autocorrelation")

        x = x + CorrelationLayer(
            inner=self_inner, d_model=cfg.d_model, n_heads=cfg.n_heads,
            config=cfg, seq_len_q=dec_q_len, seq_len_kv=dec_q_len,
            name="self_attention")(x, x, x, mask)[0]
        x, trend1 = _Decomp(cfg.moving_avg, name="decomp1")(x)
        x = x + CorrelationLayer(
            inner=cross_inner, d_model=cfg.d_model, n_heads=cfg.n_heads,
            config=cfg, seq_len_q=dec_q_len, seq_len_kv=cfg.seq_len,
            name="cross_attention")(x, cross, cross, mask)[0]
        x, trend2 = _Decomp(cfg.moving_avg, name="decomp2")(x)
        y = nn.Dense(cfg.d_ff, use_bias=False, name="conv1")(x)
        y = nn.gelu(y) if cfg.activation == "gelu" else nn.relu(y)
        y = nn.Dense(cfg.d_model, use_bias=False, name="conv2")(y)
        x, trend3 = _Decomp(cfg.moving_avg, name="decomp3")(x + y)

        residual_trend = trend1 + trend2 + trend3
        # circular k=3 conv projection of the trend (``:182-184``)
        tp = jnp.concatenate(
            [residual_trend[:, -1:], residual_trend, residual_trend[:, :1]],
            axis=1)
        residual_trend = nn.Conv(cfg.c_out, (3,), padding="VALID",
                                 use_bias=False, name="projection")(tp)
        return x, residual_trend


class FEDformer(nn.Module):
    """The full model (``FedFormer.py:17-141``)."""

    config: FEDformerConfig

    @nn.compact
    def __call__(self, x_enc, x_mark_enc, x_dec, x_mark_dec) -> jnp.ndarray:
        cfg = self.config

        # decoder init from decomposition of the encoder window
        mean = jnp.mean(x_enc, axis=1, keepdims=True)
        mean = jnp.repeat(mean, cfg.pred_len, axis=1)
        seasonal_init, trend_init = _Decomp(cfg.moving_avg,
                                            name="decomp")(x_enc)
        trend_init = jnp.concatenate(
            [trend_init[:, -cfg.label_len:], mean], axis=1)
        seasonal_init = jnp.pad(
            seasonal_init[:, -cfg.label_len:],
            ((0, 0), (0, cfg.pred_len), (0, 0)))

        enc_out = DataEmbeddingWoPos(
            cfg.d_model, cfg.embed, cfg.freq, name="enc_embedding"
        )(x_enc, x_mark_enc)
        self_inner = ("wavelet_self" if cfg.version == "Wavelets"
                      else "fourier_self" if cfg.version == "Fourier"
                      else "autocorrelation")
        for i in range(cfg.e_layers):
            enc_out, _ = FEDEncoderLayer(
                config=cfg, inner=self_inner, name=f"enc_layer{i}")(enc_out)
        enc_out = MyLayerNorm(cfg.d_model, name="enc_norm")(enc_out)

        dec_out = DataEmbeddingWoPos(
            cfg.d_model, cfg.embed, cfg.freq, name="dec_embedding"
        )(seasonal_init, x_mark_dec)
        trend = trend_init
        for i in range(cfg.d_layers):
            dec_out, residual_trend = FEDDecoderLayer(
                config=cfg, name=f"dec_layer{i}")(dec_out, enc_out)
            trend = trend + residual_trend
        dec_out = MyLayerNorm(cfg.d_model, name="dec_norm")(dec_out)
        seasonal_part = nn.Dense(cfg.c_out, name="projection")(dec_out)

        dec_out = trend + seasonal_part
        return dec_out[:, -cfg.pred_len:, :]
