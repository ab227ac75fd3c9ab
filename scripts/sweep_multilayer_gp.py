"""Multi-layer DeepGP blur sweep (BASELINE.json config 4).

Sweeps deep-GP depth x inducing-set size through the full composite and
harness (``gp_hidden_dims`` / ``num_inducing``, reference anchor
``denoising_model/DeepGP.py:76-98`` — the single layer this capability
generalizes), recording test MSE/MAE and train-step throughput.

Usage: python scripts/sweep_multilayer_gp.py [--quick]
Writes a markdown table to stdout (paste into RESULTS.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

SWEEP = [
    ((), 256),      # the reference's shipped config
    ((), 512),
    ((8,), 256),
    ((8,), 512),
    ((8, 8), 256),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    args = parser.parse_args()
    enable_compilation_cache()

    frame = make_synthetic_frame("solar", num_entities=6,
                                 steps_per_entity=1600, noise="gp")
    print("\n## Multi-layer DeepGP blur sweep (solar synthetic, gp-noise, "
          "pred 24, autoformer backbone)\n")
    print("| gp_hidden_dims | num_inducing | test MSE | test MAE | "
          "train steps/s |")
    print("|---|---|---|---|---|")
    for hidden, inducing in SWEEP:
        hargs = HarnessArgs(
            exp_name="solar", model_name=f"AutoDG_h{hidden}_m{inducing}",
            attn_type="autoformer", pred_len=24, n_trials=1,
            num_epochs=4 if args.quick else 12,
            denoising=True, gp=True,
            gp_hidden_dims=hidden, num_inducing=inducing,
            out_dir=f"/tmp/mlgp_{len(hidden)}_{inducing}",
            max_train_samples=2048 if args.quick else 8192,
            max_valid_samples=512,
            d_model_choices=(32,), stack_choices=(1,),
        )
        harness = ExperimentHarness(frame, hargs)
        t0 = time.perf_counter()
        harness.run_study()
        dt = time.perf_counter() - t0
        res = harness.evaluate()
        steps = hargs.num_epochs * harness.train_data.enc.shape[0]
        print(f"| {hidden or '()'} | {inducing} | {res['mse']:.3f} | "
              f"{res['mae']:.3f} | {steps / dt:.1f} |", flush=True)


if __name__ == "__main__":
    main()
