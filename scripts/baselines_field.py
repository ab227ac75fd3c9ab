"""Additional-baselines table on the field-profile synthetic protocol.

Reference ``Additional-baselines.pdf`` / ``baselines.py`` equivalent:
DeepAR / N-BEATS / DLinear trained through the baselines harness
(univariate windows, the reference's "previous set-up") on the same
field-profile solar frame the round-3 ablations use, one seed,
reduced epochs for the TPU budget.

Usage: python scripts/baselines_field.py [--pred_len 24] [--epochs 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.baselines_harness import (
    BaselineArgs,
    BaselinesHarness,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred_len", type=int, default=24)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--n_trials", type=int, default=2)
    p.add_argument("--out_dir", default="results_r3/baselines_field")
    args = p.parse_args()

    raw = make_synthetic_frame("solar", num_entities=8,
                               steps_per_entity=1600, seed=0, noise="gp",
                               profile="field")
    os.makedirs(args.out_dir, exist_ok=True)
    results = {}
    for model in ("DLinear", "NBeats", "DeepAR", "CMGP"):
        h = BaselinesHarness(raw, BaselineArgs(
            exp_name="solar", model_name=model, pred_len=args.pred_len,
            n_trials=args.n_trials, num_epochs=args.epochs,
            out_dir=args.out_dir))
        h.run_study()
        results[model] = h.evaluate()
    print(json.dumps({m: r for m, r in results.items()}))


if __name__ == "__main__":
    main()
