"""Bisect the exact-blur forward NaN (NOTES.md "Known gaps").

Reproduces the diverging arm of results_r3/abl_field_exact3 (seed 8220,
d_model 32, stack 1, ATA, --gp_kind exact, field profile, clip 1.0)
stepping batch-by-batch instead of epoch-scans, with per-step finiteness
flags on {loss, grads, params} and a curated intermediate capture
(forecaster outputs, GP smooth/mll, proj_up) so the FIRST non-finite
site is localized to a module, not an epoch.

At the failure step it saves the last-finite state + offending batch to
npz and re-derives the ExactGPBlur internals in numpy float64 from the
captured GP input, printing every quantity on the K -> chol -> alpha ->
smooth / quad -> logdet chain in both precisions: if fp64 survives where
fp32 did not, the event is conditioning; if fp64 blows up identically,
the event is the math (e.g. A^-1-amplified smoothing magnitude).

Usage:
    python scripts/exact_blur_bisect.py --seed 8220 --max_epochs 12
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
    ExperimentHarness,
    HarnessArgs,
)
from fine_grained_gaussian_process_forcasting_tpu.train.trainer import Trainer


def _tree_finite(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.all(jnp.array([jnp.all(jnp.isfinite(x)) for x in leaves]))


def _path_str(path) -> str:
    out = []
    for p in path:
        out.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(out)


def _summarize(inter):
    """max|x| and finiteness per captured intermediate leaf (scalars)."""
    flat = jax.tree_util.tree_flatten_with_path(inter)[0]
    stats = {}
    for path, leaf in flat:
        name = _path_str(path)
        a = jnp.abs(leaf.astype(jnp.float32))
        stats[name] = (jnp.max(a), jnp.all(jnp.isfinite(leaf)))
    return stats


CAPTURE_NAMES = {
    "forecasting_model", "deep_gp", "proj_up", "final_projection",
    "enc_embedding", "dec_embedding",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=8220)
    ap.add_argument("--max_epochs", type=int, default=12)
    ap.add_argument("--clip_grad_norm", type=float, default=1.0)
    ap.add_argument("--out", type=str, default="results_r3/exact_bisect")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    raw = make_synthetic_frame("solar", num_entities=8,
                               steps_per_entity=1600, seed=0,
                               noise="gp", profile="field")
    hargs = HarnessArgs(
        exp_name="solar", model_name="bisect", attn_type="ATA",
        pred_len=96, seed=args.seed, gp_kind="exact",
        clip_grad_norm=args.clip_grad_norm, out_dir=args.out,
    )
    h = ExperimentHarness(raw, hargs)
    model = h._make_model(32, 1)
    trainer = Trainer(model, d_model=32, warmup_steps=4000,
                      clip_grad_norm=args.clip_grad_norm)
    enc_a, dec_a, y_a = trainer.device_put_split(h.train_data)
    n_batches = enc_a.shape[0]
    print(f"train batches/epoch: {n_batches}  "
          f"enc {enc_a.shape} dec {dec_a.shape} y {y_a.shape}")

    state = trainer.init_state(
        jax.random.PRNGKey(args.seed),
        h.train_data.enc[0], h.train_data.dec[0], h.train_data.y[0])
    opt = trainer.optimizer

    def _capture(mdl, _name):
        return mdl.name in CAPTURE_NAMES

    def loss_fn(params, rngs, enc, dec, y):
        out, mods = model.apply(
            {"params": params}, enc, dec, y, training=True, rngs=rngs,
            capture_intermediates=_capture, mutable=["intermediates"])
        return out.loss, (out.mse, _summarize(mods["intermediates"]))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(params, opt_state, rng, enc, dec, y):
        rng, r1, r2 = jax.random.split(rng, 3)
        (loss, (mse, stats)), grads = grad_fn(
            params, {"noise": r1, "sampling": r2}, enc, dec, y)
        updates, new_opt = opt.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gp = params["deep_gp"]
        diag = {
            "loss": loss, "mse": mse,
            "loss_finite": jnp.isfinite(loss),
            "grads_finite": _tree_finite(grads),
            "new_params_finite": _tree_finite(new_params),
            "raw_ls_min": jnp.min(gp["raw_lengthscale"]),
            "raw_ls_max": jnp.max(gp["raw_lengthscale"]),
            "raw_os": gp["raw_outputscale"],
            "raw_noise": gp["raw_noise"],
            "mean_w_max": jnp.max(jnp.abs(gp["mean_weight"])),
            "grad_norm": optax.global_norm(grads),
        }
        return new_params, new_opt, rng, diag, stats

    jsonl = open(os.path.join(args.out, "trace.jsonl"), "w")
    params, opt_state, rng = state.params, state.opt_state, state.rng
    failed = None
    for epoch in range(args.max_epochs):
        for b in range(n_batches):
            prev = (params, opt_state, rng)
            enc, dec, y = enc_a[b], dec_a[b], y_a[b]
            params, opt_state, rng, diag, stats = step(
                params, opt_state, rng, enc, dec, y)
            diag = {k: np.asarray(v).item() for k, v in
                    jax.device_get(diag).items()}
            stats = {k: (float(v[0]), bool(v[1])) for k, v in
                     jax.device_get(stats).items()}
            rec = {"epoch": epoch, "batch": b, **diag,
                   "inter": {k: {"max": v[0], "finite": v[1]}
                             for k, v in stats.items()}}
            jsonl.write(json.dumps(rec) + "\n")
            bad_inter = [k for k, v in stats.items() if not v[1]]
            if (not diag["loss_finite"] or not diag["grads_finite"]
                    or not diag["new_params_finite"] or bad_inter):
                print(f"\n=== FIRST NON-FINITE at epoch {epoch} batch {b} ===")
                print(f"loss={diag['loss']:.6g} "
                      f"loss_finite={diag['loss_finite']} "
                      f"grads_finite={diag['grads_finite']} "
                      f"params_after_update_finite="
                      f"{diag['new_params_finite']}")
                print(f"GP raw params at step start: "
                      f"ls[min,max]=({diag['raw_ls_min']:.4g},"
                      f"{diag['raw_ls_max']:.4g}) os={diag['raw_os']:.4g} "
                      f"noise={diag['raw_noise']:.4g} "
                      f"|mean_w|max={diag['mean_w_max']:.4g}")
                print("non-finite intermediates (module order):")
                for k in bad_inter:
                    print(f"  {k}")
                print("finite intermediates with max|x|:")
                for k, v in stats.items():
                    print(f"  {'OK ' if v[1] else 'NAN'} {k}: "
                          f"max|x|={v[0]:.6g}")
                failed = (prev, (enc, dec, y), epoch, b)
                break
        else:
            print(f"epoch {epoch}: all finite  loss~{diag['loss']:.4f} "
                  f"os={diag['raw_os']:.3f} ls_min={diag['raw_ls_min']:.3f} "
                  f"gnorm={diag['grad_norm']:.3f}")
            continue
        break
    jsonl.close()

    if failed is None:
        print("no non-finite event within the budget — raise --max_epochs")
        return

    (p0, o0, r0), (enc, dec, y), epoch, b = failed
    np.savez(os.path.join(args.out, "fail_batch.npz"),
             enc=np.asarray(enc), dec=np.asarray(dec), y=np.asarray(y))
    flat = jax.tree_util.tree_flatten_with_path(jax.device_get(p0))[0]
    np.savez(os.path.join(args.out, "fail_params.npz"),
             **{_path_str(k): v for k, v in flat})
    print(f"\nsaved last-finite params + batch to {args.out}")

    # ---- phase B: fp32 vs fp64 recompute of the ExactGPBlur chain ---- #
    print("\n=== phase B: GP-internals recompute (fp32 vs fp64) ===")
    rng_, r1, r2 = jax.random.split(r0, 3)
    out, mods = model.apply(
        {"params": p0}, enc, dec, y, training=True,
        rngs={"noise": r1, "sampling": r2},
        capture_intermediates=lambda m, n: True, mutable=["intermediates"])
    inter = jax.device_get(mods["intermediates"])
    # the forecaster's dec_out (input to smooth/mll) — second element of
    # the FIRST forecasting_model call
    fm_calls = inter["forecasting_model"]["__call__"]
    enc_out, dec_out = (np.asarray(t) for t in fm_calls[0])
    print(f"forecaster outputs: max|enc_out|={np.abs(enc_out).max():.6g} "
          f"max|dec_out|={np.abs(dec_out).max():.6g} "
          f"finite={np.isfinite(dec_out).all()}")

    gp = jax.device_get(p0["deep_gp"])

    def chain(x, yv, dtype):
        x = x.astype(dtype)
        sp = lambda v: np.logaddexp(0.0, v.astype(dtype))
        ls = sp(gp["raw_lengthscale"]) + 1e-3
        os_ = sp(gp["raw_outputscale"])
        noise = sp(gp["raw_noise"]) + 1e-4
        xs = x / ls
        x2 = (xs * xs).sum(-1)
        d2 = x2[..., :, None] + x2[..., None, :] - 2.0 * np.einsum(
            "bnd,bmd->bnm", xs, xs)
        k = os_ * np.exp(-0.5 * np.maximum(d2, 0.0))
        a = k + noise * np.eye(x.shape[1], dtype=dtype)
        rep = {"ls_min": float(ls.min()), "os": float(os_),
               "noise": float(noise), "max|x|": float(np.abs(x).max()),
               "max|K|": float(np.abs(k).max())}
        try:
            chol = np.linalg.cholesky(a)
            rep["chol"] = "ok"
            rep["chol_diag_min"] = float(
                np.diagonal(chol, axis1=-2, axis2=-1).min())
        except np.linalg.LinAlgError:
            s0 = np.diagonal(a, axis1=-2, axis2=-1).mean()
            for i in range(4):
                try:
                    chol = np.linalg.cholesky(
                        a + 1e-4 * s0 * 10.0**i * np.eye(
                            x.shape[1], dtype=dtype))
                    rep["chol"] = f"ok with jitter 1e-4*s0*10^{i}"
                    break
                except np.linalg.LinAlgError:
                    chol = None
            if chol is None:
                rep["chol"] = "FAILED at max jitter"
                return rep
        z = np.einsum("bsd,d->bs", x, gp["mean_weight"].astype(dtype)) \
            + gp["mean_bias"].astype(dtype)
        rhs = z[..., None]
        sol = np.linalg.solve(chol, rhs)
        alpha = np.linalg.solve(
            np.swapaxes(chol, -1, -2), sol)[..., 0]
        smooth = np.einsum("bst,bt->bs", k, alpha)
        rep["max|z|"] = float(np.abs(z).max())
        rep["max|alpha|"] = float(np.abs(alpha).max())
        rep["max|smooth|"] = float(np.abs(smooth).max())
        rep["smooth_finite"] = bool(np.isfinite(smooth).all())
        if yv is not None:
            resid = (yv.astype(dtype) - z[:, -yv.shape[1]:])[..., None]
            # mll is evaluated on the last pred_len positions; recompute
            # the chain at that slice
            xm = x[:, -yv.shape[1]:]
            xs = xm / ls
            x2 = (xs * xs).sum(-1)
            d2 = x2[..., :, None] + x2[..., None, :] - 2.0 * np.einsum(
                "bnd,bmd->bnm", xs, xs)
            km = os_ * np.exp(-0.5 * np.maximum(d2, 0.0))
            am = km + noise * np.eye(xm.shape[1], dtype=dtype)
            try:
                cholm = np.linalg.cholesky(am)
            except np.linalg.LinAlgError:
                rep["mll_chol"] = "FAILED"
                return rep
            sol = np.linalg.solve(cholm, resid)
            alpham = np.linalg.solve(np.swapaxes(cholm, -1, -2), sol)
            quad = (resid * alpham).sum((-1, -2))
            logdet = 2.0 * np.log(
                np.diagonal(cholm, axis1=-2, axis2=-1)).sum(-1)
            rep["quad_max"] = float(quad.max())
            rep["logdet_minmax"] = (float(logdet.min()), float(logdet.max()))
        return rep

    y_np = np.asarray(y)[..., 0]
    for name, x_in in (("enc_out", enc_out), ("dec_out", dec_out)):
        if not np.isfinite(x_in).all():
            print(f"{name} is already non-finite — the event is UPSTREAM "
                  "of the GP (forecaster/attention)")
            continue
        for dtype in (np.float32, np.float64):
            rep = chain(x_in, y_np if name == "dec_out" else None, dtype)
            print(f"{name} {np.dtype(dtype).name}: "
                  + " ".join(f"{k}={v}" for k, v in rep.items()))


if __name__ == "__main__":
    main()
