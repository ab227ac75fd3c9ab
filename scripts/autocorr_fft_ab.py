"""A/B: DFT-as-GEMM vs jnp.fft for the autocorrelation op at production dims.

The round-2 finding "O(L^2) DFT-as-GEMM beats the VPU FFT ~5x" was
measured at the flagship's L=288 (non-power-of-two, d_k=4).  The
production config (bench_prod_step: enc L=512, d_k=64) multiplies the
DFT's quadratic cost by ~3.2x per row and the row count by 16x — this
script measures whether the trade flips at that scale before any
routing change ships.

Timing is the axon-safe slope pattern (scan-inside-one-jit at two
lengths, input evolution between reps, host scalar read).

Usage: python scripts/autocorr_fft_ab.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.ops import autocorrelation as ac


def timed_scan(body, init_x, iters=30):
    def step(carry, _):
        acc, xx = carry
        out = body(xx * (1.0 + 1e-12 * acc))
        acc = acc + jnp.sum(out).astype(jnp.float32)
        return (acc, xx), ()

    def make_run(length):
        @jax.jit
        def run(xx):
            (acc, _), _ = jax.lax.scan(step, (jnp.zeros(()), xx), None,
                                       length=length)
            return acc
        return run.lower(init_x).compile()

    iters_hi = iters * 8
    lo, hi = make_run(iters), make_run(iters_hi)

    def best_of(compiled):
        acc = compiled(init_x)
        float(acc)
        best, x = float("inf"), init_x
        for _ in range(3):
            x = x * (1.0 + 1e-16 * float(acc))
            t0 = time.perf_counter()
            acc = compiled(x)
            float(acc)
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(hi) - best_of(lo)) / (iters_hi - iters)


def fwd_bwd(op):
    def body(q):
        def loss(qq):
            ctx, corr = op(qq, qq + 0.1, qq - 0.1, factor=1, training=True)
            return jnp.sum(ctx * ctx) + jnp.sum(corr)
        return jax.grad(loss)(q)
    return body


def main():
    for (b, h, L, d) in [(64, 8, 512, 64), (64, 8, 128, 64),
                         (256, 8, 288, 4)]:
        q = jax.random.normal(jax.random.PRNGKey(0), (b, h, L, d),
                              dtype=jnp.bfloat16)
        rows = {}
        for name, flag in [("dft_gemm", False), ("fft", True)]:
            # the module global is the only toggle auto_correlation reads
            ac._FORCE_FFT = flag
            t = timed_scan(fwd_bwd(ac.auto_correlation), q)
            rows[name] = t * 1e3
        print(f"(b={b}, h={h}, L={L}, d={d}) bf16 fwd+bwd: "
              f"dft_gemm {rows['dft_gemm']:.3f} ms  fft {rows['fft']:.3f} ms")


if __name__ == "__main__":
    main()
