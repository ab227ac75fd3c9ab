"""Bisect train-step cost across model configs (TPU perf pass tooling)."""

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

B, ENC_LEN, DEC_LEN, PRED, F = 256, 192, 96, 96, 4
STEPS = 10


def measure(tag, **kw):
    model = ForecastDenoising(
        src_input_size=F, tgt_input_size=F, d_model=32, n_heads=8, d_k=4,
        stack_size=1, pred_len=PRED, **kw)
    rng = jax.random.PRNGKey(0)
    enc = jax.random.normal(rng, (B, ENC_LEN, F))
    dec = jax.random.normal(rng, (B, DEC_LEN, F))
    y = jax.random.normal(rng, (B, PRED, 1))

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

    @jax.jit
    def run(p, s, r):
        (p, s, r), losses = jax.lax.scan(step, (p, s, r), None, length=STEPS)
        return p, s, r, jnp.sum(losses)

    # chain state across reps (the tunnel dedups identical dispatches) and
    # force a host scalar read (block_until_ready alone can return early)
    t0 = time.perf_counter()
    params, opt_state, rng, s = run(params, opt_state, rng)
    float(s)
    compile_s = time.perf_counter() - t0
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, rng, s = run(params, opt_state, rng)
        float(s)
        dt = min(dt, time.perf_counter() - t0)
    print(f"{tag:40s} {1000*dt/STEPS:8.2f} ms/step  "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "plain_basic": dict(attn_type="basic", denoise=False, gp=False),
        "plain_autoformer": dict(attn_type="autoformer", denoise=False,
                                 gp=False),
        "iso_autoformer": dict(attn_type="autoformer", denoise=True,
                               gp=False),
        "gp_basic": dict(attn_type="basic", denoise=True, gp=True),
        "gp_autoformer": dict(attn_type="autoformer", denoise=True, gp=True),
        "gp_autoformer_pallas": dict(attn_type="autoformer", denoise=True,
                                     gp=True, use_pallas_gp=True),
        "gp_ATA": dict(attn_type="ATA", denoise=True, gp=True),
        "gp_informer": dict(attn_type="informer", denoise=True, gp=True),
        "plain_autoformer_bf16": dict(attn_type="autoformer", denoise=False,
                                      gp=False, compute_dtype=jnp.bfloat16),
        "gp_autoformer_bf16": dict(attn_type="autoformer", denoise=True,
                                   gp=True, compute_dtype=jnp.bfloat16),
        "plain_basic_pallas_attn": dict(attn_type="basic", denoise=False,
                                        gp=False, use_pallas_attention=True),
        "gp_basic_pallas_attn": dict(attn_type="basic", denoise=True,
                                     gp=True, use_pallas_attention=True),
        "gp_ATA_pallas_attn": dict(attn_type="ATA", denoise=True, gp=True,
                                   use_pallas_attention=True),
        "plain_ATA": dict(attn_type="ATA", denoise=False, gp=False),
        "plain_ATA_pallas_attn": dict(attn_type="ATA", denoise=False,
                                      gp=False, use_pallas_attention=True),
    }
    for tag, kw in cases.items():
        if which != "all" and which != tag:
            continue
        measure(tag, **kw)
