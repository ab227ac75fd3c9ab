"""Serving-latency benchmark: flagship AutoDG inference forward.

Measures the jitted eval-mode forward (the exact computation
``train.predict.InferenceSession`` dispatches) at serving batch sizes,
on-device, slope-timed (two scan lengths cancel this platform's ~31 ms
fixed per-dispatch RPC cost, which is a property of the dev tunnel, not
of TPU serving).  Reports ms/batch and windows/s per batch size.

Usage: python scripts/bench_inference.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
)

ENC_LEN, DEC_LEN, F = 192, 96, 4
D_MODEL, HEADS, STACK, INDUCING = 32, 8, 1, 256


def bench_batch(model, params, b, iters=100, quantize=None,
                enc_len=None, dec_len=None, feats=None):
    enc_len, dec_len, feats = (enc_len or ENC_LEN, dec_len or DEC_LEN,
                               feats or F)
    enc = jax.random.normal(jax.random.PRNGKey(1), (b, enc_len, feats))
    dec = jax.random.normal(jax.random.PRNGKey(2), (b, dec_len, feats))

    from fine_grained_gaussian_process_forcasting_tpu.train.quantize import (
        build_qparams,
        quantized_apply,
    )

    qmap = build_qparams(params) if quantize == "int8" else {}

    def fwd(e):
        # same path InferenceSession serves: pre-quantized weights via
        # the shared quantized_apply context
        with quantized_apply(quantize, lambda: qmap):
            out = model.apply({"params": params}, e, dec, training=False,
                              rngs={"noise": jax.random.PRNGKey(0),
                                    "sampling": jax.random.PRNGKey(1)})
        return out.predictions

    def step(carry, _):
        acc, e = carry
        p = fwd(e + 1e-12 * acc)
        return (acc + jnp.sum(p[..., :1, :]), e), ()

    def make_run(length):
        @jax.jit
        def run(e):
            (acc, _), _ = jax.lax.scan(step, (jnp.zeros(()), e), None,
                                       length=length)
            return acc
        return run.lower(enc).compile()

    iters_hi = iters * 8
    lo, hi = make_run(iters), make_run(iters_hi)

    def best_of(compiled):
        acc = compiled(enc)
        float(acc)
        best, e = float("inf"), enc
        for _ in range(3):
            e = e * (1.0 + 1e-16 * float(acc))
            t0 = time.perf_counter()
            acc = compiled(e)
            float(acc)
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (best_of(hi) - best_of(lo)) / (iters_hi - iters)
    return {"ms": dt * 1e3, "windows_per_sec": b / dt}


def main():
    model = ForecastDenoising(
        src_input_size=F, tgt_input_size=F, d_model=D_MODEL, n_heads=HEADS,
        d_k=D_MODEL // HEADS, stack_size=STACK, pred_len=DEC_LEN,
        attn_type="autoformer", gp=True, denoise=True,
        num_inducing=INDUCING)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, ENC_LEN, F))
    dec = jax.random.normal(jax.random.PRNGKey(2), (1, DEC_LEN, F))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(3),
         "sampling": jax.random.PRNGKey(4)}, enc, dec)["params"]

    out = {"config": "AutoDG flagship eval forward (enc 192, pred 96)"}
    for b in (1, 16, 64, 256):
        r = bench_batch(model, params, b)
        out[f"b{b}_ms"] = round(r["ms"], 3)
        out[f"b{b}_windows_per_sec"] = round(r["windows_per_sec"])
        r8 = bench_batch(model, params, b, quantize="int8")
        out[f"b{b}_int8_ms"] = round(r8["ms"], 3)
        out[f"b{b}_int8_windows_per_sec"] = round(r8["windows_per_sec"])
    print(json.dumps(out))

    # production width: where the Dense GEMMs dominate and int8 pays
    dm, el, dl, ft = 512, 512, 128, 8
    big = ForecastDenoising(
        src_input_size=ft, tgt_input_size=ft, d_model=dm, n_heads=8,
        d_k=dm // 8, stack_size=2, pred_len=dl, attn_type="autoformer",
        gp=True, denoise=True, num_inducing=INDUCING)
    enc = jax.random.normal(jax.random.PRNGKey(1), (1, el, ft))
    dec = jax.random.normal(jax.random.PRNGKey(2), (1, dl, ft))
    params = big.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(3),
         "sampling": jax.random.PRNGKey(4)}, enc, dec)["params"]
    out = {"config": "AutoDG d512 eval forward (enc 512, pred 128)"}
    for b in (16, 64):
        for tag, q in (("", None), ("int8_", "int8")):
            r = bench_batch(big, params, b, iters=20, quantize=q,
                            enc_len=el, dec_len=dl, feats=ft)
            out[f"b{b}_{tag}ms"] = round(r["ms"], 3)
            out[f"b{b}_{tag}windows_per_sec"] = round(r["windows_per_sec"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
