"""Fused softmax attention Pallas kernel.

At this model family's sequence lengths (<= 640) the full score matrix of
one (batch, head) fits comfortably in VMEM, so the win over XLA is not
tiling (classic flash attention) but *fusion*: scores -> softmax -> context
never touch HBM.  XLA materializes the (b*h, L, L) attention weights in
fp32 both forward and backward (~1.2 GB of traffic per AutoDG step at
b=256, L=192); this kernel keeps them on-chip.

Forward per grid cell (one batch*head):  S = q k^T / sqrt(d);
P = softmax(S); o = P v.  Backward recomputes P from the saved q/k (cheap)
and fuses dv = P^T do, dp = do v^T, ds = P * (dp - rowsum(dp * P)),
dq = ds k / sqrt(d), dk = ds^T q / sqrt(d).

Dtype policy (round 3): the GEMM inputs follow the model's compute dtype
— bf16 inputs run the five GEMMs as bf16 x bf16 -> fp32 accumulation
(MXU native rate); the softmax and the ds assembly always run fp32.
The head dim is used unpadded when it is a multiple of 64 (Mosaic allows
a block dim equal to the array dim); smaller head dims zero-pad to the
128-lane boundary (exact: padded lanes contribute zero to every
contraction).

Measured on v5e (RESULTS.md): at d_k=4 the 32x lane padding dominates and
the kernel is ~2x slower than XLA's native batched path, so it stays
opt-in (``use_pallas_attention``); the round-2 fp32-only variant also
lost ~10% at d_k=64 — this bf16 + unpadded revision is the production
(d_k >= 64) route.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, bf16):
    if bf16:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _softmax(s, sm_bf16):
    """Row softmax.  ``sm_bf16``: max-subtract in fp32 (exact), then the
    exp/sum/divide chain on bf16 values — the cast error of the
    non-positive argument t is |t|*2^-8, and exp(t) decays far faster
    than that error grows, so attention weights stay within ~0.4% (the
    bf16 compute envelope the rest of the model already runs in).  The
    VPU packs bf16 2-per-lane (16, 128) tiles, halving the elementwise
    pass cost that bounds this op family (NOTES.md softmax-VPU floor).
    Returns bf16 probabilities (fed straight to the bf16 MXU dot)."""
    if not sm_bf16:
        return jax.nn.softmax(s, axis=-1)
    t = (s - jnp.max(s, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    e = jnp.exp(t)
    denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    return e / denom.astype(jnp.bfloat16)


def _fwd_kernel(bf16, sm_bf16, scale_ref, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = _dot(q, k.T, bf16) * scale_ref[0, 0]
    p = _softmax(s, sm_bf16)
    o_ref[0] = _dot(p, v, bf16)


def _bwd_kernel(bf16, sm_bf16, scale_ref, q_ref, k_ref, v_ref, do_ref,
                dq_ref, dk_ref, dv_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    scale = scale_ref[0, 0]
    s = _dot(q, k.T, bf16) * scale
    p = _softmax(s, sm_bf16)
    dv_ref[0] = _dot(p.T, do, bf16)
    dp = _dot(do, v.T, bf16)
    pf = p.astype(jnp.float32) if sm_bf16 else p
    ds = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    dq_ref[0] = _dot(ds, k, bf16) * scale
    dk_ref[0] = _dot(ds.T, q, bf16) * scale


def _pad_lanes(x, dpad):
    if x.shape[-1] == dpad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, dpad - x.shape[-1])))


def _specs(n, lq, lk, dpad, n_out=1):
    blk = lambda l: pl.BlockSpec((1, l, dpad), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        blk(lq), blk(lk), blk(lk),
    ]
    return in_specs


def _flatten(q, k, v):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    # a head dim that is a multiple of 64 runs unpadded (block dim ==
    # array dim is Mosaic-legal); smaller head dims pad to the lane width
    dpad = d if d % 64 == 0 else max(128, ((d + 127) // 128) * 128)
    bf16 = q.dtype == jnp.bfloat16
    n = b * h
    ct = jnp.bfloat16 if bf16 else jnp.float32
    qf = _pad_lanes(q.reshape(n, lq, d).astype(ct), dpad)
    kf = _pad_lanes(k.reshape(n, lk, d).astype(ct), dpad)
    vf = _pad_lanes(v.reshape(n, lk, d).astype(ct), dpad)
    scale = jnp.asarray(1.0 / math.sqrt(d), jnp.float32).reshape(1, 1)
    return qf, kf, vf, scale, (b, h, lq, lk, d, dpad, n, bf16, ct)


def _make_fused(sm_bf16: bool):
    def _fwd(q, k, v):
        qf, kf, vf, scale, (b, h, lq, lk, d, dpad, n, bf16, ct) = _flatten(
            q, k, v)
        o = pl.pallas_call(
            functools.partial(_fwd_kernel, bf16, sm_bf16),
            out_shape=jax.ShapeDtypeStruct((n, lq, dpad), jnp.float32),
            grid=(n,),
            in_specs=_specs(n, lq, lk, dpad),
            out_specs=pl.BlockSpec((1, lq, dpad), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * n * lq * lk * (2 * dpad),
                bytes_accessed=qf.dtype.itemsize * n
                * (lq + 2 * lk + lq) * dpad,
                transcendentals=n * lq * lk,
            ),
            interpret=jax.default_backend() == "cpu",
        )(scale, qf, kf, vf)
        out = o[:, :, :d].reshape(b, h, lq, d).astype(q.dtype)
        return out, (q, k, v)

    def _bwd(res, g):
        q, k, v = res
        qf, kf, vf, scale, (b, h, lq, lk, d, dpad, n, bf16, ct) = _flatten(
            q, k, v)
        gf = _pad_lanes(g.reshape(n, lq, d).astype(ct), dpad)
        blk = lambda l: pl.BlockSpec((1, l, dpad), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_kernel, bf16, sm_bf16),
            out_shape=(
                jax.ShapeDtypeStruct((n, lq, dpad), jnp.float32),
                jax.ShapeDtypeStruct((n, lk, dpad), jnp.float32),
                jax.ShapeDtypeStruct((n, lk, dpad), jnp.float32),
            ),
            grid=(n,),
            in_specs=_specs(n, lq, lk, dpad) + [blk(lq)],
            out_specs=(blk(lq), blk(lk), blk(lk)),
            cost_estimate=pl.CostEstimate(
                flops=5 * 2 * n * lq * lk * dpad,
                bytes_accessed=qf.dtype.itemsize * n
                * (3 * lq + 4 * lk) * dpad,
                transcendentals=n * lq * lk,
            ),
            interpret=jax.default_backend() == "cpu",
        )(scale, qf, kf, vf, gf)
        to = lambda x, l: x[:, :, :d].reshape(b, h, l, d)
        return (to(dq, lq).astype(q.dtype), to(dk, lk).astype(k.dtype),
                to(dv, lk).astype(v.dtype))

    @jax.custom_vjp
    def fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
        o, _ = _fwd(q, k, v)
        return o

    fused.defvjp(_fwd, _bwd)
    return fused


#: Softmax attention over (b, h, l, d); context only (no attn matrix).
#: Numerically matches ``ops.attention.scaled_dot_attention``'s context
#: (to bf16 GEMM tolerance when the inputs are bf16).
fused_attention = _make_fused(sm_bf16=False)

#: Same kernel with the bf16 softmax chain (see ``_softmax``): halves the
#: VPU elementwise-pass bytes that bound the softmax op family at
#: production dims.  Opt-in — promote only on a measured whole-step win
#: (RESULTS.md round-4 softmax A/B).
fused_attention_bf16sm = _make_fused(sm_bf16=True)
