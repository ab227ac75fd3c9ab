"""Production-scale perf: larger model dims where MXU/kernels matter.

The reference's configs are tiny (d_model <= 32); this measures the
framework at serving-relevant sizes (d_model 512, d_k 64, L 512) across
the XLA path, the fused-attention Pallas kernel, and bf16 compute.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from fine_grained_gaussian_process_forcasting_tpu.models.forecast_denoising import (
    ForecastDenoising,
)
from fine_grained_gaussian_process_forcasting_tpu.utils.cache import (
    enable_compilation_cache,
)

enable_compilation_cache()

B, ENC_LEN, DEC_LEN, PRED, F = 64, 512, 128, 128, 8
D_MODEL, HEADS = 512, 8
STEPS = 10


def measure(tag, **kw):
    model = ForecastDenoising(
        src_input_size=F, tgt_input_size=F, d_model=D_MODEL, n_heads=HEADS,
        d_k=D_MODEL // HEADS, stack_size=2, pred_len=PRED,
        attn_type="basic", gp=True, denoise=True, num_inducing=256, **kw)
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
        return losses

    t0 = time.perf_counter()
    losses = run(params, opt_state, rng)
    jax.block_until_ready(losses)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    losses = run(params, opt_state, rng)
    jax.block_until_ready(losses)
    dt = time.perf_counter() - t0
    wps = B * STEPS / dt
    print(f"{tag:30s} {1000*dt/STEPS:8.2f} ms/step  {wps:9.0f} windows/s "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "xla_fp32": dict(),
        "pallas_attn_fp32": dict(use_pallas_attention=True),
        "xla_bf16": dict(compute_dtype=jnp.bfloat16),
        "pallas_gp": dict(use_pallas_gp=True),
    }
    for tag, kw in cases.items():
        if which != "all" and which != tag:
            continue
        measure(tag, **kw)
