"""Round-4 softmax-family MFU attack (VERDICT r3 item 4): A/B the basic
(softmax) attention op at production dims.

The softmax op family runs at ~36% of bf16 peak at d512 while the
autoformer flagship hits 52%; round-3 attribution bounded the remaining
headroom at 1.5-2x (fp32 softmax VPU floor).  The VPU packs bf16
2-per-lane, so moving the exp/sum/divide chain to bf16 (max-subtract
stays fp32 — exact, and the cast error of the non-positive argument is
dominated by exp's own decay) halves the elementwise bytes per pass.

Variants measured (op-level fwd+bwd, slope-timed, axon-safe):
- xla_fp32sm:   the shipped scaled_dot_attention (fp32 softmax)
- xla_bf16sm:   same einsums, bf16 exp/sum/div after fp32 max-subtract
- pallas:       ops.pallas.flash_attention.fused_attention (fp32 softmax)
- pallas_bf16sm: fused_attention_bf16sm (bf16 softmax chain in-kernel)
plus a pure-exp micro A/B (fp32 vs bf16 pass over the score shape).

Shapes: the production encoder self-attention (b=64, h=8, L=512, d=64)
and the decoder cross-attention (Lq=128, Lk=512); plus the flagship
d_k=4 shape for the head-folded regime.

Usage: python scripts/softmax_ab_r4.py [--iters 20]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.ops.attention import (
    scaled_dot_attention,
)
from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.flash_attention import (
    fused_attention,
    fused_attention_bf16sm,
)


def timed_scan(body, init_x, iters=20):
    def step(carry, _):
        acc, xx = carry
        out = body(xx * (1.0 + 1e-12 * acc.astype(xx.dtype)))
        acc = acc + jnp.sum(out.astype(jnp.float32))
        return (acc, xx), ()

    def make_run(length):
        @jax.jit
        def run(xx):
            (acc, _), _ = jax.lax.scan(step, (jnp.zeros(()), xx), None,
                                       length=length)
            return acc
        return run.lower(init_x).compile()

    iters_hi = iters * 6
    lo, hi = make_run(iters), make_run(iters_hi)

    def best_of(compiled):
        acc = compiled(init_x)
        float(acc)
        best, x = float("inf"), init_x
        for _ in range(3):
            x = (x * (1.0 + 1e-16 * float(acc))).astype(x.dtype)
            t0 = time.perf_counter()
            acc = compiled(x)
            float(acc)
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(hi) - best_of(lo)) / (iters_hi - iters)


def xla_bf16sm_attention(q, k, v):
    """XLA-path variant: fp32-accum scores + fp32 max-subtract, then the
    exp/sum/divide chain in bf16 (what _softmax does in-kernel)."""
    d_k = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(d_k)
    t = (s - jnp.max(s, axis=-1, keepdims=True)).astype(jnp.bfloat16)
    e = jnp.exp(t)
    denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
    p = e / denom.astype(jnp.bfloat16)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    return ctx.astype(v.dtype)


def attn_fwd_bwd(op):
    def body(q):
        def loss(qq):
            out = op(qq, qq + 0.1, qq - 0.1)
            out = out[0] if isinstance(out, tuple) else out
            return jnp.sum(out * out)
        return jax.grad(loss)(q)
    return body


def exp_pass(dtype):
    def body(x):
        return jnp.exp(x.astype(dtype)).astype(jnp.float32)
    return body


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    shapes = [
        ("prod enc-self", (64, 8, 512, 64), None),
        ("prod dec-cross", (64, 8, 128, 64), 512),
        ("flagship", (256, 8, 192, 4), None),
    ]
    print("| shape | variant | ms fwd+bwd |")
    print("|---|---|---|")
    for name, (b, h, lq, d), lk in shapes:
        lk = lk or lq
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (b, h, lq, d), dtype=jnp.bfloat16)
        variants = [
            ("xla_fp32sm", attn_fwd_bwd(scaled_dot_attention)),
            ("xla_bf16sm", attn_fwd_bwd(xla_bf16sm_attention)),
            ("pallas", attn_fwd_bwd(fused_attention)),
            ("pallas_bf16sm", attn_fwd_bwd(fused_attention_bf16sm)),
        ]
        if lk != lq:
            # cross-attention: k/v come from the encoder side; reshape the
            # benchmark to pass a (b,h,lk,d) kv derived from q via tiling
            kv = jnp.tile(q[:, :, :1, :], (1, 1, lk, 1))

            def cross(op):
                def body(qq):
                    def loss(x):
                        out = op(x, kv + 0.1, kv - 0.1)
                        out = out[0] if isinstance(out, tuple) else out
                        return jnp.sum(out * out)
                    return jax.grad(loss)(qq)
                return body

            variants = [(n, cross(op)) for n, op in [
                ("xla_fp32sm", scaled_dot_attention),
                ("xla_bf16sm", xla_bf16sm_attention),
                ("pallas", fused_attention),
                ("pallas_bf16sm", fused_attention_bf16sm),
            ]]
        for vname, body in variants:
            try:
                t = timed_scan(body, q, iters=args.iters)
                print(f"| {name} | {vname} | {t*1e3:.3f} |", flush=True)
            except Exception as e:  # pallas can reject a shape; record it
                print(f"| {name} | {vname} | FAILED: "
                      f"{type(e).__name__} |", flush=True)

    # pure-exp micro A/B at the enc-self score shape
    rows = 64 * 8 * 512
    x = jax.random.normal(jax.random.PRNGKey(1), (rows, 512),
                          dtype=jnp.float32) - 3.0
    for dt, label in [(jnp.float32, "exp fp32"), (jnp.bfloat16, "exp bf16")]:
        t = timed_scan(exp_pass(dt), x, iters=args.iters)
        print(f"| exp micro ({rows}x512) | {label} | {t*1e3:.3f} |",
              flush=True)


if __name__ == "__main__":
    main()
