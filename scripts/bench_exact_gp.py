"""Exact-GP stretch benchmarks (BASELINE.json config 5).

1. Trains the exact-GP blur composite (``gp_kind='exact'``, reference
   anchor ``denoising_model/GPModel.py:4-13`` generalized to full-sequence
   kernel-ridge blur) across all seven dataset schemas on synthetic data,
   recording test MSE/MAE and train-step throughput at the TRUE sequence
   lengths (total_time_steps = enc + 2*pred per formatter).
2. Benchmarks the batched Cholesky at those sizes: XLA vs the Pallas
   blocked/unblocked kernels (``ops/pallas/cholesky.py``).

Usage: python scripts/bench_exact_gp.py [--quick]
Writes a markdown table to stdout (paste into RESULTS.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

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
from fine_grained_gaussian_process_forcasting_tpu.utils.cache import (
    enable_compilation_cache,
)

EXPERIMENTS = ("solar", "electricity", "traffic", "exchange", "covid",
               "air_quality", "watershed")


def bench_cholesky(batch: int = 256, sizes=(192, 256, 384)) -> list:
    from fine_grained_gaussian_process_forcasting_tpu.ops.pallas.cholesky import (
        batched_cholesky,
    )

    rows = []
    for n in sizes:
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, n, 16))
        a = jnp.einsum("bnd,bmd->bnm", x, x) + n * jnp.eye(n)

        def timeit(fn):
            f = jax.jit(fn)
            out = f(a)
            jax.block_until_ready(out)
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(a)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            # correctness guard
            l = np.asarray(out)
            err = np.abs(l @ l.transpose(0, 2, 1) - np.asarray(a)).max()
            assert err < 1e-2 * n, err
            return best * 1e3

        xla_ms = timeit(jnp.linalg.cholesky)
        pallas_ms = timeit(batched_cholesky)
        rows.append((batch, n, xla_ms, pallas_ms))
        print(f"| ({batch}, {n}, {n}) | {xla_ms:.2f} | {pallas_ms:.2f} |",
              flush=True)
    return rows


def run_exact_gp(exp: str, quick: bool) -> dict:
    args = HarnessArgs(
        exp_name=exp, model_name="ExactGP", attn_type="autoformer",
        pred_len=24, n_trials=1, num_epochs=3 if quick else 8,
        denoising=True, gp=True, gp_kind="exact",
        out_dir=f"/tmp/exactgp_{exp}",
        max_train_samples=1024 if quick else 4096,
        max_valid_samples=256,
        d_model_choices=(32,), stack_choices=(1,),
    )
    frame = make_synthetic_frame(exp, num_entities=4, steps_per_entity=1200,
                                 noise="gp")
    harness = ExperimentHarness(frame, args)
    seq = harness.params["total_time_steps"]
    t0 = time.perf_counter()
    harness.run_study()
    train_s = time.perf_counter() - t0
    res = harness.evaluate()
    steps = (args.num_epochs
             * harness.train_data.enc.shape[0])
    return {"exp": exp, "seq": seq, "mse": res["mse"], "mae": res["mae"],
            "steps_per_sec": steps / train_s}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--skip_cholesky", action="store_true")
    args = parser.parse_args()
    enable_compilation_cache()

    if not args.skip_cholesky:
        print("\n## Batched Cholesky: XLA vs Pallas (ms, fp32)\n")
        print("| shape | XLA | Pallas unblocked |")
        print("|---|---|---|")
        bench_cholesky()

    print("\n## Exact-GP blur across the seven dataset schemas "
          "(synthetic, gp-noise, pred 24)\n")
    print("| dataset | seq len (n of the O(n^3) solve) | test MSE | "
          "test MAE | train steps/s |")
    print("|---|---|---|---|---|")
    for exp in EXPERIMENTS:
        r = run_exact_gp(exp, args.quick)
        print(f"| {r['exp']} | {r['seq']} | {r['mse']:.3f} | {r['mae']:.3f} "
              f"| {r['steps_per_sec']:.1f} |", flush=True)


if __name__ == "__main__":
    main()
