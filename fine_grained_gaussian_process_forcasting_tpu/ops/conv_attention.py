"""Convolutional attention ops: ATA, ACAT, ConvAttn.

Re-designs of the reference's conv-pyramid attention family
(``forecasting_models/ATA.py:7-65``, ``ACAT.py:7-58``, ``ConvAttn.py:10-40``).

Two deliberate behavioral deltas vs. the reference, both documented in
SURVEY.md section 7 "hard parts (e)":

1. **Trained convolutions.** The reference re-instantiates these modules
   with fresh (seed-fixed) random weights inside every
   ``MultiHeadAttention.forward`` call
   (``modules/multi_head_attention.py:49-88``), so the conv/BN weights are
   never trained.  Here they are ordinary Flax params owned by the layer.
2. **Clean multi-scale stacking.** The reference concatenates the scale
   outputs along the *batch* dim and reshapes, which scrambles
   batch/scale/channel/time together (``ATA.py:52-60``).  We stack scales
   on their own axis and take the top-1 across scales per (position,
   channel) — the stated intent of the op.

BatchNorm uses *batch statistics in both train and eval*: because the
reference re-creates its BN modules every forward in training mode, running
averages are never populated or used; replicating that exactly removes all
mutable state and keeps the op purely functional.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
    scaled_dot_attention,
)


class BatchStatsNorm(nn.Module):
    """BatchNorm1d that always normalizes with the current batch stats.

    Equivalent to a freshly constructed ``nn.BatchNorm1d`` in training mode
    (the reference's effective behavior — see module docstring), but with
    learned scale/bias.
    Input layout: (batch, length, channels); stats over (batch, length).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=(0, 1), keepdims=True)
        var = jnp.var(x, axis=(0, 1), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias


def _dot_attention(q, k, v, use_pallas: bool):
    """Final softmax attention of the conv family; optionally the fused
    head-folded Pallas kernel (scores/probs never touch HBM)."""
    if use_pallas:
        from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.head_folded_attention import (
            head_folded_attention,
        )

        return head_folded_attention(q, k, v), None
    return scaled_dot_attention(q, k, v)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, l, d) -> (b, l, h*d) for channel-mixing convs."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _split_heads(x: jnp.ndarray, h: int) -> jnp.ndarray:
    """(b, l, h*d) -> (b, h, l, d)."""
    b, l, hd = x.shape
    return x.reshape(b, l, h, hd // h).transpose(0, 2, 1, 3)


class ATAAttention(nn.Module):
    """Multi-scale conv (k in {1,3,7,9}) + BN + ReLU over Q and K, top-1
    across scales, then dot-product attention
    (reference ``forecasting_models/ATA.py``).
    """

    d_k: int
    n_heads: int
    filter_lengths: Sequence[int] = (1, 3, 7, 9)
    use_pallas_attention: bool = False

    @nn.compact
    def __call__(self, q, k, v) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.n_heads
        qc, kc = _merge_heads(q), _merge_heads(k)
        c = qc.shape[-1]

        def pyramid(x, name):
            outs = []
            for f in self.filter_lengths:
                y = nn.Conv(c, (f,), padding="SAME", name=f"{name}_conv{f}")(x)
                y = BatchStatsNorm(name=f"{name}_bn{f}")(y)
                outs.append(nn.relu(y))
            return jnp.stack(outs, axis=-1)  # (b, l, c, S)

        q_scales = pyramid(qc, "q")
        k_scales = pyramid(kc, "k")
        q_top = jnp.max(q_scales, axis=-1)  # top-1 over scales
        k_top = jnp.max(k_scales, axis=-1)
        return _dot_attention(_split_heads(q_top, h), _split_heads(k_top, h),
                              v, self.use_pallas_attention)


class ACATAttention(nn.Module):
    """Conv pyramids (k in {3,9}) + shared BN + ELU; per-scale scores on
    stride-subsampled keys, max over scales, scatter into a strided attention
    map, re-softmax (reference ``forecasting_models/ACAT.py``).
    """

    d_k: int
    n_heads: int
    filter_lengths: Sequence[int] = (3, 9)

    @nn.compact
    def __call__(self, q, k, v) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.n_heads
        b, _, l, d_k = q.shape
        l_k = k.shape[2]
        qc, kc = _merge_heads(q), _merge_heads(k)
        c = qc.shape[-1]
        norm = BatchStatsNorm(name="shared_bn")  # single BN shared across q/k/scales

        def pyramid(x, name):
            outs = []
            for f in self.filter_lengths:
                y = nn.Conv(c, (f,), padding="SAME", use_bias=False,
                            name=f"{name}_conv{f}")(x)
                outs.append(nn.elu(norm(y)))
            return jnp.stack(outs, axis=1)  # (b, S, l, c)

        q_p = pyramid(qc, "q")  # (b, S, l, c)
        k_p = pyramid(kc, "k")  # (b, S, l_k, c)
        S = len(self.filter_lengths)
        q_p = q_p.reshape(b, S, l, h, d_k).transpose(0, 3, 1, 2, 4)  # (b,h,S,l,d)
        k_p = k_p.reshape(b, S, l_k, h, d_k).transpose(0, 3, 1, 2, 4)

        m_f = max(self.filter_lengths)
        k_sub = k_p[:, :, :, 0::m_f, :]  # stride-subsampled keys
        scores = jnp.einsum(
            "bhpqd,bhpkd->bhpqk", q_p, k_sub, preferred_element_type=jnp.float32
        ) / math.sqrt(self.d_k)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.max(attn, axis=2)  # max over scales: (b,h,l,l_k//m_f ceil)

        attn_full = jnp.zeros((b, h, l, l_k), dtype=attn.dtype)
        attn_full = attn_full.at[:, :, :, 0::m_f].set(attn)
        # Re-softmax over the full length: untouched positions carry e^0
        # mass, exactly like the reference (``ACAT.py:53-56``).
        attn_full = jax.nn.softmax(attn_full, axis=-1)
        context = jnp.einsum(
            "bhqk,bhkd->bhqd", attn_full.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
        return context, attn_full


class ConvAttnAttention(nn.Module):
    """Single k=9 conv smoothing of Q and K, then dot-product attention
    (reference ``forecasting_models/ConvAttn.py``).
    """

    d_k: int
    n_heads: int
    kernel: int = 9
    use_pallas_attention: bool = False

    @nn.compact
    def __call__(self, q, k, v) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.n_heads
        qc, kc = _merge_heads(q), _merge_heads(k)
        c = qc.shape[-1]
        qs = nn.Conv(c, (self.kernel,), padding="SAME", use_bias=False,
                     name="conv_q")(qc)
        ks = nn.Conv(c, (self.kernel,), padding="SAME", use_bias=False,
                     name="conv_k")(kc)
        return _dot_attention(_split_heads(qs, h), _split_heads(ks, h), v,
                              self.use_pallas_attention)
