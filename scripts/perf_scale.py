"""Production-scale perf: larger model dims where MXU/kernels matter.

The reference's configs are tiny (d_model <= 32); this measures the
framework at serving-relevant sizes (default d_model 512, d_k 64,
enc 512) across the XLA path, fused-attention Pallas, and bf16 compute —
reporting ms/step, achieved TFLOP/s and % of the v5e bf16 peak (VERDICT
r2 item 4: an MFU story is only credible at production dims).

Axon-safe timing: steps chained through a lax.scan carry inside ONE jit;
params evolve across repeat dispatches (the tunnel dedups identical
dispatches); a host scalar read forces true completion.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

V5E_BF16_PEAK_TFLOPS = 197.0


def measure(tag, args, **kw):
    B, F = args.batch, 8
    model = ForecastDenoising(
        src_input_size=F, tgt_input_size=F, d_model=args.d_model,
        n_heads=args.heads, d_k=args.d_model // args.heads,
        stack_size=args.stack, pred_len=args.pred_len,
        attn_type=args.attn_type, gp=args.gp, denoise=args.denoise,
        num_inducing=args.inducing, **kw)
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (B, args.enc_len, F))
    dec = jax.random.normal(rng, (B, args.dec_len, F))
    y = jax.random.normal(rng, (B, args.pred_len, 1))

    @jax.jit
    def _init(r):
        return model.init({"params": r, "noise": r, "sampling": r},
                          enc, dec, y, training=True)

    params = _init(rng)["params"]
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)

    def loss_fn(p, r):
        out = model.apply({"params": p}, enc, dec, y, training=True,
                          rngs={"noise": r, "sampling": r})
        return out.loss

    def step(carry, _):
        p, s, r = carry
        r, sub = jax.random.split(r)
        loss, grads = jax.value_and_grad(loss_fn)(p, sub)
        updates, s = optimizer.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, r), loss

    def make_run(length):
        @jax.jit
        def run(p, s, r):
            (p, s, r), losses = jax.lax.scan(step, (p, s, r), None,
                                             length=length)
            return p, s, r, losses
        return run.lower(params, opt_state, rng).compile()

    try:
        one = jax.jit(lambda p, s, r: step((p, s, r), None))
        ca = one.lower(params, opt_state, rng).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        step_flops = float(ca.get("flops", float("nan")))
    except Exception:
        step_flops = float("nan")

    # SLOPE timing at two scan lengths cancels the tunnel's ~31 ms fixed
    # per-dispatch RPC cost (see scripts/kernel_overhead_r3.py)
    steps_hi = args.steps * 4
    t0 = time.perf_counter()
    compiled_lo = make_run(args.steps)
    compiled_hi = make_run(steps_hi)
    compile_s = time.perf_counter() - t0

    def best_of(compiled, p, s, r, reps=3):
        # warmup + evolve state so repeat dispatches are never
        # byte-identical
        p, s, r, losses = compiled(p, s, r)
        np.asarray(losses)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            p, s, r, losses = compiled(p, s, r)
            np.asarray(losses)
            best = min(best, time.perf_counter() - t0)
        return best, (p, s, r)

    t_lo, state = best_of(compiled_lo, params, opt_state, rng)
    t_hi, _ = best_of(compiled_hi, *state)
    sec_per_step = (t_hi - t_lo) / (steps_hi - args.steps)
    ms = 1000 * sec_per_step
    tflops = step_flops / sec_per_step / 1e12
    pct = 100 * tflops / V5E_BF16_PEAK_TFLOPS
    row = {
        "config": tag, "d_model": args.d_model, "batch": B,
        "enc_len": args.enc_len, "attn_type": args.attn_type,
        "gp": args.gp, "denoise": args.denoise,
        "ms_per_step": round(ms, 2),
        "windows_per_sec": round(B / sec_per_step),
        "step_tflops": round(tflops, 2),
        "pct_of_bf16_peak": round(pct, 2),
        "peak_denominator": "v5e bf16 197 TFLOP/s",
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("case", nargs="?", default="all")
    p.add_argument("--d_model", type=int, default=512)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--stack", type=int, default=2)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--enc_len", type=int, default=512)
    p.add_argument("--dec_len", type=int, default=128)
    p.add_argument("--pred_len", type=int, default=128)
    p.add_argument("--inducing", type=int, default=256)
    p.add_argument("--attn_type", default="basic")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--gp", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-gp measures the step without the GP blur "
                        "(production-step bisect)")
    p.add_argument("--denoise", action=argparse.BooleanOptionalAction,
                   default=True)
    args = p.parse_args()

    # NOTE (round 5): the model's use_pallas_attention default is now
    # None = auto (shape-gated route), so the unflagged cases measure
    # the SHIPPED route; the *_forced_* cases pin either endpoint.
    cases = {
        "xla_forced_bf16": dict(use_pallas_attention=False,
                                compute_dtype=jnp.bfloat16,
                                gp_compute_dtype=jnp.bfloat16),
        "xla_fp32": dict(),
        "pallas_attn_fp32": dict(use_pallas_attention=True),
        "xla_bf16": dict(compute_dtype=jnp.bfloat16,
                         gp_compute_dtype=jnp.bfloat16),
        "pallas_attn_bf16": dict(use_pallas_attention=True,
                                 compute_dtype=jnp.bfloat16,
                                 gp_compute_dtype=jnp.bfloat16),
    }
    for tag, kw in cases.items():
        if args.case != "all" and args.case != tag:
            continue
        measure(tag, args, **kw)
