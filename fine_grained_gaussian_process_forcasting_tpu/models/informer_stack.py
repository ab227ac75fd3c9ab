"""Vanilla (Informer-style) encoder/decoder stack with distilling convs.

Re-design of ``layers/Transformer_EncDec.py:6-120`` and the generic
``AttentionLayer`` wrapper (``layers/SelfAttention_Family.py:134-162``) —
dead code in the reference (imported by nothing) but part of the component
inventory: pre-norm-ish residual blocks with k=1 conv FFNs and an optional
circular-conv + max-pool distilling layer between encoder blocks.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.ops.conv_attention import (
    BatchStatsNorm,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.full_attention import (
    full_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.probsparse import (
    prob_sparse_attention,
)


class AttentionLayer(nn.Module):
    """Projection wrapper around an inner attention op
    (``SelfAttention_Family.py:134-162``)."""

    d_model: int
    n_heads: int
    inner: str = "full"  # 'full' | 'prob'
    mask_flag: bool = False

    @nn.compact
    def __call__(self, queries, keys, values, mask=None):
        B, L, _ = queries.shape
        S = keys.shape[1]
        H = self.n_heads
        q = nn.Dense(self.d_model, name="query_projection")(queries)
        k = nn.Dense(self.d_model, name="key_projection")(keys)
        v = nn.Dense(self.d_model, name="value_projection")(values)
        q = q.reshape(B, L, H, -1)
        k = k.reshape(B, S, H, -1)
        v = v.reshape(B, S, H, -1)
        if self.inner == "prob":
            rng = (self.make_rng("sampling") if self.has_rng("sampling")
                   else jax.random.PRNGKey(0))
            ctx, attn = prob_sparse_attention(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), rng, factor=5,
                mask_flag=self.mask_flag)
            out = ctx.transpose(0, 2, 1, 3)
        else:
            out, attn = full_attention(q, k, v, mask_flag=self.mask_flag)
        out = out.reshape(B, L, -1)
        return nn.Dense(self.d_model, name="out_projection")(out), attn


class ConvLayer(nn.Module):
    """Distilling layer: circular k=3 conv + BN + ELU + stride-2 max-pool
    (``Transformer_EncDec.py:6-24``)."""

    c_in: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # circular padding of 2 like the reference's padding_mode='circular'
        xp = jnp.concatenate([x[:, -2:], x, x[:, :2]], axis=1)
        y = nn.Conv(self.c_in, (3,), padding="VALID", name="down_conv")(xp)
        y = BatchStatsNorm(name="norm")(y)
        y = nn.elu(y)
        # max-pool k=3 stride=2 pad=1
        yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)), constant_values=-jnp.inf)
        n_out = y.shape[1] // 2 + y.shape[1] % 2
        windows = jnp.stack(
            [yp[:, 2 * i : 2 * i + 3] for i in range(n_out)], axis=1)
        return jnp.max(windows, axis=2)


class InformerEncoderLayer(nn.Module):
    """Residual attention + k=1 conv FFN (``Transformer_EncDec.py:27-51``)."""

    d_model: int
    d_ff: Optional[int] = None
    activation: str = "relu"
    n_heads: int = 8
    inner: str = "full"

    @nn.compact
    def __call__(self, x, mask=None):
        d_ff = self.d_ff or 4 * self.d_model
        new_x, attn = AttentionLayer(
            d_model=self.d_model, n_heads=self.n_heads, inner=self.inner,
            name="attention")(x, x, x, mask)
        x = x + new_x
        y = x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        act = nn.relu if self.activation == "relu" else nn.gelu
        y = act(nn.Dense(d_ff, name="conv1")(y))
        y = nn.Dense(self.d_model, name="conv2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y), attn


class InformerEncoder(nn.Module):
    """Encoder with optional distilling between layers
    (``Transformer_EncDec.py:53-77``)."""

    d_model: int
    n_layers: int = 2
    n_heads: int = 8
    inner: str = "prob"
    distil: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.n_layers):
            x, _ = InformerEncoderLayer(
                d_model=self.d_model, n_heads=self.n_heads, inner=self.inner,
                name=f"layer{i}")(x, mask)
            if self.distil and i < self.n_layers - 1:
                x = ConvLayer(self.d_model, name=f"distil{i}")(x)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x)


class InformerDecoderLayer(nn.Module):
    """Self + cross attention decoder layer
    (``Transformer_EncDec.py:80-107``)."""

    d_model: int
    n_heads: int = 8

    @nn.compact
    def __call__(self, x, cross, x_mask=None, cross_mask=None):
        # masked ProbSparse self-attention (Informer's decoder uses
        # ProbAttention(mask_flag=True): causal ProbMask + cumsum initial
        # context, ``SelfAttention_Family.py:44-131``)
        x = x + AttentionLayer(
            d_model=self.d_model, n_heads=self.n_heads, inner="prob",
            mask_flag=True, name="self_attention")(x, x, x, x_mask)[0]
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x + AttentionLayer(
            d_model=self.d_model, n_heads=self.n_heads, inner="full",
            name="cross_attention")(x, cross, cross, cross_mask)[0]
        y = x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.relu(nn.Dense(4 * self.d_model, name="conv1")(y))
        y = nn.Dense(self.d_model, name="conv2")(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(x + y)
