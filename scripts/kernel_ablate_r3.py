"""Attribute the fused-GP kernel's time budget (VERDICT r3 follow-up).

perf_bisect_r3 showed the fused whitened-marginal kernel itself (not the
Cholesky path) dominates the GP segment, and bench r3 shows its runtime
is nearly d-independent (1.30 ms at d=32 vs 1.35 ms at d=128) — i.e. the
(R, M) elementwise + exp chains on the VPU, not the MXU GEMMs, set the
floor.  This script measures stripped-down kernel variants on the real
TPU to attribute that cost before touching ops/pallas/fused_gp.py:

  full        the production fwd kernel math
  noexp       exp() replaced by identity (polynomial-transcendental cost)
  gemm_only   dist GEMM + KW GEMM + reductions only (no exp, no k-chain)
  kw_only     the single dominant (TR,M)(M,M) GEMM + reduction
  tr<N>       the full kernel at alternative row-tile sizes

All fwd-only (the bwd recomputes the same chains; attribution carries
over).  Axon-safe: scan-chained inside one jit, inputs evolved between
reps, host scalar read in the timed region.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, SEQ = 256, 288


def make_fwd(variant: str, tr: int, m: int, d: int, bf16_kw=True):
    """Variants keep the ORIGINAL (1, 1, TR) lane-layout outputs except
    ``kwcol``, which stores (TR, 1) COLUMN outputs — the round-3 fix:
    row-reductions land in sublanes, so no per-tile sublane->lane
    transpose is emitted (measured 2.3x on the whole fwd kernel; shipped
    in ops/pallas/fused_gp.py)."""
    column = variant == "kwcol"

    def kernel(xs_ref, zs_ref, u_ref, w_ref, os_ref, mean_ref, var_ref):
        os_ = os_ref[0, 0]
        x = xs_ref[:]
        z = zs_ref[:]
        if variant in ("kw_only", "kwcol"):
            k = jnp.dot(x, z.T, preferred_element_type=jnp.float32)
        else:
            x2 = jnp.sum(x * x, axis=-1, keepdims=True)
            z2 = jnp.sum(z * z, axis=-1, keepdims=True)
            d2 = (x2 + z2.T
                  - 2.0 * jnp.dot(x, z.T, preferred_element_type=jnp.float32))
            if variant in ("full",):
                k = os_ * jnp.exp(-0.5 * d2)
            elif variant == "noexp":
                k = os_ * (-0.5 * d2)
            elif variant == "gemm_only":
                k = d2
            else:
                raise ValueError(variant)
        kk = k.astype(jnp.bfloat16) if bf16_kw else k
        w = w_ref[:].astype(jnp.bfloat16) if bf16_kw else w_ref[:]
        g = jnp.dot(kk, w, preferred_element_type=jnp.float32)
        if column:
            mean_ref[0] = jnp.sum(k * u_ref[:], axis=-1, keepdims=True)
            var_ref[0] = os_ - jnp.sum(g * k, axis=-1, keepdims=True)
        else:
            mean_ref[0, 0, :] = jnp.sum(k * u_ref[:], axis=-1)
            var_ref[0, 0, :] = os_ - jnp.sum(g * k, axis=-1)

    def fwd(xf, zs, u, w, os2d):
        rp = xf.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(rp // tr,),
            in_specs=[
                pl.BlockSpec((tr, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tr, 1) if column else (1, 1, tr),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr, 1) if column else (1, 1, tr),
                             lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct(
                    (rp // tr, tr, 1) if column else (rp // tr, 1, tr),
                    jnp.float32),
                jax.ShapeDtypeStruct(
                    (rp // tr, tr, 1) if column else (rp // tr, 1, tr),
                    jnp.float32),
            ],
        )(xf, zs, u, w, os2d)

    return fwd


def timed(fn, args_evolving, iters=50):
    """Slope timing (two scan lengths) — cancels the tunnel's ~31 ms
    fixed per-dispatch RPC cost; see scripts/kernel_overhead_r3.py."""
    def step(carry, _):
        acc, xf = carry
        mean, var = fn(xf, *args_evolving[1:])
        acc = acc + jnp.sum(mean[0, 0, :8]) + jnp.sum(var[0, 0, :8])
        xf = xf * (1.0 + 1e-18 * acc)
        return (acc, xf), ()

    def make_run(length):
        @jax.jit
        def run(xf):
            (acc, _), _ = jax.lax.scan(step, (jnp.zeros(()), xf), None,
                                       length=length)
            return acc
        return run.lower(args_evolving[0]).compile()

    iters_hi = iters * 8
    compiled_lo = make_run(iters)
    compiled_hi = make_run(iters_hi)

    def best_of(compiled):
        acc = compiled(args_evolving[0])
        float(acc)
        best = float("inf")
        x = args_evolving[0]
        for _ in range(3):
            x = x * (1.0 + 1e-16 * float(acc))
            t0 = time.perf_counter()
            acc = compiled(x)
            float(acc)
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(compiled_lo)
    t_hi = best_of(compiled_hi)
    return (t_hi - t_lo) / (iters_hi - iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--d_model", type=int, default=32)
    p.add_argument("--inducing", type=int, default=256)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    d, m = args.d_model, args.inducing

    r = B * SEQ
    key = jax.random.PRNGKey(0)
    zs = jax.random.normal(key, (m, d))
    u = jnp.ones((1, m)) * 0.01
    w = jnp.eye(m) * 0.5
    os2d = jnp.ones((1, 1))

    out = {"d_model": d, "inducing": m, "rows": r}
    for tr in (512, 1024, 2048, 4096):
        rp = -(-r // tr) * tr
        xf = jax.random.normal(jax.random.PRNGKey(1), (rp, d))
        for variant in ("full", "noexp", "gemm_only", "kw_only", "kwcol"):
            fn = make_fwd(variant, tr, m, d)
            ms = timed(fn, (xf, zs, u, w, os2d), args.iters) * 1e3
            out[f"{variant}_tr{tr}_ms"] = round(ms, 4)
        # fp32 KW GEMM comparison at this tile size
        fn = make_fwd("full", tr, m, d, bf16_kw=False)
        ms = timed(fn, (xf, zs, u, w, os2d), args.iters) * 1e3
        out[f"full_fp32kw_tr{tr}_ms"] = round(ms, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
