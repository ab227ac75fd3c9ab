"""Isolate the exact-blur NaN: phase B of the bisect showed the captured
inputs produce a well-conditioned A whose numpy fp32/fp64 Cholesky is
fine, yet the jitted TPU step emitted a NaN factorization.  This script
replays the saved (params, batch) under several execution modes to
localize the trigger:

  1. jitted value_and_grad (the failing mode), x3 repeats
  2. jitted forward-only (no autodiff)
  3. eager forward
  4. standalone jnp.linalg.cholesky of A computed on-device
  5. the same A factorized on the CPU backend

Usage: python scripts/exact_blur_repro.py [--dir results_r3/exact_bisect]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
    ExperimentHarness,
    HarnessArgs,
)


def load_tree(npz_path):
    flat = np.load(npz_path)
    tree = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return tree


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, default="results_r3/exact_bisect")
    args = ap.parse_args()

    raw = make_synthetic_frame("solar", num_entities=8,
                               steps_per_entity=1600, seed=0,
                               noise="gp", profile="field")
    hargs = HarnessArgs(exp_name="solar", model_name="repro",
                        attn_type="ATA", pred_len=96, seed=0,
                        gp_kind="exact", out_dir=args.dir)
    h = ExperimentHarness(raw, hargs)
    model = h._make_model(32, 1)

    params = load_tree(os.path.join(args.dir, "fail_params.npz"))
    batch = np.load(os.path.join(args.dir, "fail_batch.npz"))
    enc = jnp.asarray(batch["enc"])
    dec = jnp.asarray(batch["dec"])
    y = jnp.asarray(batch["y"])
    rngs = {"noise": jax.random.PRNGKey(1), "sampling": jax.random.PRNGKey(2)}

    def capture(mdl, _n):
        return mdl.name in {"deep_gp", "forecasting_model"}

    def fwd(p):
        out, mods = model.apply({"params": p}, enc, dec, y, training=True,
                                rngs=rngs, capture_intermediates=capture,
                                mutable=["intermediates"])
        inter = mods["intermediates"]
        chols = [c[1] for c in inter["deep_gp"]["_factor"]]
        return out.loss, [jnp.all(jnp.isfinite(c)) for c in chols], inter

    def loss_only(p):
        loss, flags, _ = fwd(p)
        return loss, flags

    # 1. jitted value_and_grad x3
    vg = jax.jit(jax.value_and_grad(lambda p: loss_only(p)[0]))
    for i in range(3):
        loss, grads = vg(params)
        gfin = all(bool(np.all(np.isfinite(g)))
                   for g in jax.tree_util.tree_leaves(jax.device_get(grads)))
        print(f"[1] value_and_grad rep{i}: loss={float(loss):.6g} "
              f"grads_finite={gfin}")

    # 2. jitted forward-only
    jfwd = jax.jit(loss_only)
    loss, flags = jfwd(params)
    print(f"[2] jit forward: loss={float(loss):.6g} "
          f"chol_finite={[bool(f) for f in jax.device_get(flags)]}")

    # 3. eager forward
    loss, flags, inter = fwd(params)
    print(f"[3] eager forward: loss={float(loss):.6g} "
          f"chol_finite={[bool(f) for f in jax.device_get(flags)]}")

    # grab the GP inputs (forecaster outputs) for standalone factorization
    enc_out, dec_out = inter["forecasting_model"]["__call__"][0]
    gp = params["deep_gp"]
    ls = jax.nn.softplus(gp["raw_lengthscale"]) + 1e-3
    os_ = jax.nn.softplus(gp["raw_outputscale"])
    noise = jax.nn.softplus(gp["raw_noise"]) + 1e-4

    def build_a(x):
        xs = x / ls
        x2 = jnp.sum(xs * xs, axis=-1)
        d2 = x2[..., :, None] + x2[..., None, :] - 2.0 * jnp.einsum(
            "bnd,bmd->bnm", xs, xs, preferred_element_type=jnp.float32)
        k = os_ * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
        return k + noise * jnp.eye(x.shape[1], dtype=k.dtype)

    for name, x_in in (("enc_out(192)", enc_out), ("dec_out(96)", dec_out),
                       ("dec_out_mll(96)", dec_out[:, -96:])):
        a = jax.jit(build_a)(x_in)
        afin = bool(jnp.all(jnp.isfinite(a)))
        # 4. standalone TPU cholesky (jitted and eager)
        c_jit = jax.jit(jnp.linalg.cholesky)(a)
        c_eager = jnp.linalg.cholesky(a)
        print(f"[4] {name}: A_finite={afin} "
              f"tpu_chol_jit_finite={bool(jnp.all(jnp.isfinite(c_jit)))} "
              f"tpu_chol_eager_finite={bool(jnp.all(jnp.isfinite(c_eager)))}")
        # 5. same A on CPU backend
        cpu = jax.devices("cpu")[0]
        a_cpu = jax.device_put(jax.device_get(a), cpu)
        with jax.default_device(cpu):
            c_cpu = jax.jit(jnp.linalg.cholesky)(a_cpu)
        print(f"[5] {name}: cpu_chol_finite="
              f"{bool(np.all(np.isfinite(np.asarray(c_cpu))))}")
        # numpy ground truth
        try:
            np.linalg.cholesky(np.asarray(a))
            print(f"    {name}: numpy chol ok")
        except np.linalg.LinAlgError as e:
            print(f"    {name}: numpy chol FAILED: {e}")


if __name__ == "__main__":
    main()
