"""End-to-end example: the ``example_run.ipynb`` equivalent.

Reference notebook flow (cells 1-9): build solar.csv -> run the 3-seed
ATA ablations -> evaluate and print MSE/MAE per variant.  This script does
the same against real data when ``solar.csv`` exists, or synthetic data
otherwise, with a reduced budget so it completes in minutes on one chip.

    python examples/example_run.py [--full]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.harness import (
    ExperimentHarness,
    HarnessArgs,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--full", action="store_true",
                        help="reference-scale budget (50 epochs, 4 configs)")
    parser.add_argument("--data_csv", type=str, default="solar.csv")
    parser.add_argument("--out_dir", type=str, default="example_outputs")
    args = parser.parse_args()

    if os.path.exists(args.data_csv):
        raw = pd.read_csv(args.data_csv, dtype={"date": str})
    else:
        print(f"{args.data_csv} not found -> synthetic solar data")
        raw = make_synthetic_frame("solar", num_entities=8,
                                   steps_per_entity=2000)

    budget = dict(num_epochs=50, n_trials=5) if args.full else dict(
        num_epochs=5, n_trials=1, d_model_choices=(32,), stack_choices=(1,))

    variants = {
        "ATA_gp": dict(denoising=True, gp=True),
        "ATA_iso": dict(denoising=True, gp=False),
        "ATA_no": dict(denoising=False, gp=False),
    }
    results = {}
    for name, flags in variants.items():
        print(f"=== {name} ===")
        harness = ExperimentHarness(raw, HarnessArgs(
            exp_name="solar", model_name=name, attn_type="ATA",
            pred_len=24, seed=4219, out_dir=args.out_dir,
            **flags, **budget,
        ))
        harness.run_study()
        results[name] = harness.evaluate()

    print("\n=== summary (test MSE / MAE) ===")
    for name, r in results.items():
        print(f"{name}: {r['mse']:.3f} / {r['mae']:.3f}")


if __name__ == "__main__":
    main()
