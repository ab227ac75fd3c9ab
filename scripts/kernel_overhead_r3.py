"""Isolate pallas_call invocation overhead (round-3 follow-up).

kernel_ablate_r3 found every stripped variant of the fused-GP kernel
costs ~1.0 ms fwd — including a single (R,M)(M,M) bf16 GEMM worth only
~100 us of MXU time — so the bound is neither VPU nor MXU.  This script
times, in the identical scan-in-one-jit harness:

  xla_gemm    the same k = x z^T; g = k w; reductions, as plain XLA ops
  pallas_gemm the kw_only pallas variant (one grid, TR rows per cell)
  pallas_noop a pallas kernel that only copies a tiny block per cell
  pallas_1cell the kw_only kernel with grid=(1,) on a tiny 1-tile input

If pallas_noop ~ pallas_gemm >> xla_gemm, the platform charges a fixed
per-invocation cost for Mosaic custom calls and the fused kernel's
optimization target is invocation count, not kernel internals.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, x, iters=50):
    def step(carry, _):
        acc, xx = carry
        out = fn(xx)
        acc = acc + out
        xx = xx * (1.0 + 1e-18 * acc)
        return (acc, xx), ()

    @jax.jit
    def run(xx):
        (acc, _), _ = jax.lax.scan(step, (jnp.zeros(()), xx), None,
                                   length=iters)
        return acc

    compiled = run.lower(x).compile()
    acc = compiled(x)
    float(acc)
    best = float("inf")
    for _ in range(3):
        x = x * (1.0 + 1e-16 * float(acc))
        t0 = time.perf_counter()
        acc = compiled(x)
        float(acc)
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=73728)
    p.add_argument("--m", type=int, default=256)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--tr", type=int, default=2048)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    r, m, d, tr = args.rows, args.m, args.d, args.tr
    rp = -(-r // tr) * tr

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (rp, d))
    z = jax.random.normal(jax.random.PRNGKey(1), (m, d))
    w = jnp.eye(m) * 0.5

    out = {"rows": rp, "m": m, "d": d, "tr": tr}

    def xla_gemm(xx):
        k = jnp.dot(xx, z.T, preferred_element_type=jnp.float32)
        g = jnp.dot(k.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return jnp.sum(g * k)

    out["xla_gemm_ms"] = timed(xla_gemm, x, args.iters) * 1e3

    def gemm_kernel(x_ref, z_ref, w_ref, o_ref):
        k = jnp.dot(x_ref[:], z_ref[:].T,
                    preferred_element_type=jnp.float32)
        g = jnp.dot(k.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        o_ref[0, 0, :] = jnp.sum(g * k, axis=-1)

    def pallas_gemm(xx):
        o = pl.pallas_call(
            gemm_kernel,
            grid=(rp // tr,),
            in_specs=[
                pl.BlockSpec((tr, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, tr), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp // tr, 1, tr), jnp.float32),
        )(xx, z, w)
        return jnp.sum(o)

    out["pallas_gemm_ms"] = timed(pallas_gemm, x, args.iters) * 1e3

    def noop_kernel(x_ref, o_ref):
        o_ref[0, 0, :] = x_ref[:, 0] * 2.0

    def pallas_noop(xx):
        o = pl.pallas_call(
            noop_kernel,
            grid=(rp // tr,),
            in_specs=[pl.BlockSpec((tr, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, tr), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rp // tr, 1, tr), jnp.float32),
        )(xx)
        return jnp.sum(o)

    out["pallas_noop_ms"] = timed(pallas_noop, x, args.iters) * 1e3

    x1 = x[:tr]

    def pallas_1cell(xx):
        o = pl.pallas_call(
            gemm_kernel,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((tr, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((m, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, tr), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1, tr), jnp.float32),
        )(xx, z, w)
        return jnp.sum(o)

    out["pallas_1cell_ms"] = timed(pallas_1cell, x1, args.iters) * 1e3

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
