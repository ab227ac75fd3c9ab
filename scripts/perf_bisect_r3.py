"""Round-3 GP-segment bisect: where does the non-kernel time go?

VERDICT r2 weak #2: the fused Pallas kernel removed the HBM traffic, but
the measured segment (gp.apply fwd+grad) still spends most of its time
OUTSIDE the marginal kernel — hypothesized XLA-side 256x256 Cholesky +
triangular-inverse + the u/W assembly.  This script times each piece in
isolation on the real TPU (axon-safe pattern: scan-inside-one-jit,
input evolution between reps, host scalar read) so the optimization
target is measured, not guessed.

Pieces:
  chol      cholesky(Kzz) + L^-1 via triangular solve + u/W assembly
            (per-step, input-independent of x) — fwd+grad
  kernel    fused whitened_marginals (fp32 / bf16) fwd+grad alone,
            u/W precomputed
  segment   full DeepGP.apply fwd+grad (what bench.py reports)

Usage: python scripts/perf_bisect_r3.py [--d_model 32] [--inducing 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, SEQ = 256, 288  # flagship: b=256, enc 192 + dec 96


def timed_scan(body, init_x, iters=50):
    """axon-safe SLOPE timing: body evals chained in one jit at two scan
    lengths; per-iter = (T_hi - T_lo)/(iters_hi - iters_lo), cancelling
    the tunnel's ~31 ms fixed per-dispatch RPC cost (round-3 finding —
    single-length timing inflated every sub-ms kernel by +0.6 ms)."""
    def step(carry, _):
        acc, xx = carry
        out = body(xx + 1e-12 * acc)
        acc = acc + out
        return (acc, xx), out

    def make_run(length):
        @jax.jit
        def run(xx):
            (acc, _), outs = jax.lax.scan(step, (jnp.zeros(()), xx), None,
                                          length=length)
            return acc, outs
        return run.lower(init_x).compile()

    iters_hi = iters * 8
    compiled_lo = make_run(iters)
    compiled_hi = make_run(iters_hi)

    def best_of(compiled):
        acc, _ = compiled(init_x)
        float(acc)
        best = float("inf")
        x = init_x
        for _ in range(3):
            x = x * (1.0 + 1e-16 * float(acc))
            t0 = time.perf_counter()
            acc, _ = compiled(x)
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

    from fine_grained_gaussian_process_forcasting_tpu.gp.deep_gp import DeepGP
    from fine_grained_gaussian_process_forcasting_tpu.gp.kernels import (
        rbf_ard,
        softplus,
    )
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas import fused_gp

    key = jax.random.PRNGKey(0)
    inducing = jax.random.normal(key, (m, d))
    var_mean = jnp.zeros((m,))
    var_log_std = jnp.zeros((m,))
    raw_ls = jnp.zeros((d,))
    raw_os = jnp.zeros(())
    x = jax.random.normal(jax.random.PRNGKey(1), (B, SEQ, d))

    results = {"d_model": d, "inducing": m, "b": B, "seq": SEQ}

    # --- piece 1: Cholesky path (fwd+grad wrt the GP params) ----------- #
    def chol_path(z):
        def f(zz):
            ls = softplus(raw_ls)
            os_ = softplus(raw_os)
            kzz = rbf_ard(zz, zz, ls, os_)
            kzz = kzz + 1e-4 * jnp.eye(m)
            chol = jnp.linalg.cholesky(kzz)
            chol_inv = jax.scipy.linalg.solve_triangular(
                chol, jnp.eye(m), lower=True)
            s2 = jnp.exp(2.0 * var_log_std)
            u = chol_inv.T @ var_mean
            w = chol_inv.T @ (chol_inv * (1.0 - s2)[:, None])
            return jnp.sum(u) + jnp.sum(w)

        val, g = jax.value_and_grad(f)(z)
        return val + jnp.sum(g)

    results["chol_ms"] = timed_scan(chol_path, inducing, args.iters) * 1e3

    # --- piece 2: fused kernel alone (fwd+grad wrt x, u, w) ------------ #
    ls0 = softplus(raw_ls)
    os0 = softplus(raw_os)
    kzz = rbf_ard(inducing, inducing, ls0, os0) + 1e-4 * jnp.eye(m)
    chol = jnp.linalg.cholesky(kzz)
    chol_inv = jax.scipy.linalg.solve_triangular(chol, jnp.eye(m),
                                                 lower=True)
    u0 = chol_inv.T @ var_mean
    w0 = chol_inv.T @ (chol_inv * (1.0 - jnp.exp(2 * var_log_std))[:, None])
    zs0 = inducing / ls0

    for name, op in (("kernel_fp32", fused_gp.whitened_marginals),
                     ("kernel_bf16", fused_gp.whitened_marginals_bf16)):
        def kern(xx, op=op):
            def f(xi):
                mean, var = op(xi / ls0, zs0, u0, w0, os0)
                return jnp.sum(mean) + jnp.sum(var)

            val, g = jax.value_and_grad(f)(xx)
            return val + jnp.sum(g)

        results[name + "_ms"] = timed_scan(kern, x, args.iters) * 1e3

    # --- piece 3: full segment (bench.py's metric) --------------------- #
    for name, dtype, fused in (("segment_fp32", None, True),
                               ("segment_bf16", jnp.bfloat16, True),
                               ("segment_xla_fp32", None, False)):
        gp = DeepGP(input_dims=d, num_inducing=m, compute_dtype=dtype,
                    use_fused=fused)
        params = jax.jit(gp.init)(jax.random.PRNGKey(0), x)["params"]

        def seg(xx, gp=gp, params=params):
            def f(p):
                post = gp.apply({"params": p}, xx)
                return jnp.sum(post.mean) + jnp.sum(post.var) + post.kl

            val, g = jax.value_and_grad(f)(params)
            return val + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))

        results[name + "_ms"] = timed_scan(seg, x, args.iters) * 1e3

    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
