"""Head-folded fused softmax attention for tiny head dims (d_k ~ 4).

The round-1 ``flash_attention`` kernel padded each head's d_k from 4 to
128 lanes *in HBM* (32x input traffic), which is why it lost to XLA at
this model family's shapes.  This kernel keeps all heads of one batch
sample folded into the lane dimension — operands travel as
(b, L, h*d_k), so HBM padding is 128/(h*d_k) = 4x instead of 32x — and
the (L, L) scores/probabilities per head live only in VMEM: the
(b, h, L, L) fp32 score+softmax tensors XLA materializes forward AND
backward (~1.8 GB of HBM traffic per AutoDG basic step at b=256, L=192)
never touch HBM.

Grid: one cell per batch sample.  Per cell, a static Python loop over
heads slices (L, d) panels out of the folded VMEM block (static lane
offsets — Mosaic relayouts, no HBM cost) and runs the classic fused
attention forward/backward on MXU dots.

Numerics match ``ops.attention.scaled_dot_attention`` exactly (fp32
scores/softmax).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(h, d, scale_ref, q_ref, k_ref, v_ref, o_ref):
    scale = scale_ref[0, 0]
    q_all = q_ref[0]  # (Lq, h*d)
    k_all = k_ref[0]
    v_all = v_ref[0]
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        s = jnp.dot(q_all[:, sl], k_all[:, sl].T,
                    preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0, :, sl] = jnp.dot(p, v_all[:, sl],
                                  preferred_element_type=jnp.float32)


def _bwd_kernel(h, d, scale_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    scale = scale_ref[0, 0]
    q_all = q_ref[0]
    k_all = k_ref[0]
    v_all = v_ref[0]
    do_all = do_ref[0]
    for i in range(h):
        sl = slice(i * d, (i + 1) * d)
        q, k, v, do = (q_all[:, sl], k_all[:, sl], v_all[:, sl],
                       do_all[:, sl])
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        dv_ref[0, :, sl] = jnp.dot(p.T, do,
                                   preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_ref[0, :, sl] = jnp.dot(ds, k,
                                   preferred_element_type=jnp.float32) * scale
        dk_ref[0, :, sl] = jnp.dot(ds.T, q,
                                   preferred_element_type=jnp.float32) * scale


def _fold(x):
    """(b, h, l, d) -> (b, l, h*d) with head-major lanes."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def _unfold(x, h):
    b, l, hd = x.shape
    return x.reshape(b, l, h, hd // h).transpose(0, 2, 1, 3)


@jax.custom_vjp
def head_folded_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Fused softmax attention over (b, h, l, d); returns the context only.

    Numerically identical to ``scaled_dot_attention``'s context.
    """
    o, _ = _fwd(q, k, v)
    return o


def _specs(lq, lk, hd, n_in):
    blkq = pl.BlockSpec((1, lq, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blkk = pl.BlockSpec((1, lk, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return [smem, blkq, blkk, blkk] + ([blkq] if n_in == 5 else [])


def _fwd(q, k, v):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    hd = h * d
    qf = _fold(q).astype(jnp.float32)
    kf = _fold(k).astype(jnp.float32)
    vf = _fold(v).astype(jnp.float32)
    scale = jnp.asarray(1.0 / math.sqrt(d), jnp.float32).reshape(1, 1)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, h, d),
        out_shape=jax.ShapeDtypeStruct((b, lq, hd), jnp.float32),
        grid=(b,),
        in_specs=_specs(lq, lk, hd, 4),
        out_specs=pl.BlockSpec((1, lq, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * lk * d,
            bytes_accessed=4 * b * (2 * lq + 2 * lk) * hd,
            transcendentals=b * h * lq * lk,
        ),
        interpret=jax.default_backend() == "cpu",
    )(scale, qf, kf, vf)
    return _unfold(o, h).astype(q.dtype), (q, k, v)


def _bwd(res, g):
    q, k, v = res
    b, h, lq, d = q.shape
    lk = k.shape[2]
    hd = h * d
    qf = _fold(q).astype(jnp.float32)
    kf = _fold(k).astype(jnp.float32)
    vf = _fold(v).astype(jnp.float32)
    gf = _fold(g).astype(jnp.float32)
    scale = jnp.asarray(1.0 / math.sqrt(d), jnp.float32).reshape(1, 1)
    blkq = pl.BlockSpec((1, lq, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blkk = pl.BlockSpec((1, lk, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, h, d),
        out_shape=(
            jax.ShapeDtypeStruct((b, lq, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, lk, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, lk, hd), jnp.float32),
        ),
        grid=(b,),
        in_specs=_specs(lq, lk, hd, 5),
        out_specs=(blkq, blkk, blkk),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * lq * lk * d,
            bytes_accessed=4 * b * (3 * lq + 4 * lk) * hd,
            transcendentals=b * h * lq * lk,
        ),
        interpret=jax.default_backend() == "cpu",
    )(scale, qf, kf, vf, gf)
    return (_unfold(dq, h).astype(q.dtype), _unfold(dk, h).astype(k.dtype),
            _unfold(dv, h).astype(v.dtype))


head_folded_attention.defvjp(_fwd, _bwd)
