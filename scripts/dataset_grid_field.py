"""Field-profile 3-arm ablation across dataset schemas.

The reference's grids span three datasets (traffic / electricity /
solar — Additional-baselines.pdf, Supplementary Tables); the round-3
field studies covered solar.  This drives the run.sh arm set
{D-GP, D-Iso, No-D} on the electricity and traffic schemas at the same
protocol: field-profile synthetic data, formatter-default windows,
pred 96, 50 epochs, 3 vmapped seeds, HPO pinned to d_model 32 / stack 1.

Usage: python scripts/dataset_grid_field.py [--exps electricity,traffic]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "gp": ["--denoising", "True", "--gp", "True"],
    "iso": ["--denoising", "True", "--gp", "False", "--iso", "True"],
    "no": ["--denoising", "False", "--gp", "False"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exps", default="electricity,traffic")
    p.add_argument("--arms", default=",".join(ARMS),
                   help="comma-separated subset of arms (resume support)")
    p.add_argument("--out_dir", default="results_r3/abl_field_datasets")
    p.add_argument("--num_epochs", type=int, default=50)
    args = p.parse_args()
    arms = {k: ARMS[k] for k in args.arms.split(",")}

    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    os.makedirs(args.out_dir, exist_ok=True)
    for exp in args.exps.split(","):
        for arm, flags in arms.items():
            print(f"=== {exp} / {arm} ===", flush=True)
            cli.main([
                "--exp_name", exp, "--synthetic",
                "--synthetic_profile", "field", "--synthetic_noise", "gp",
                "--attn_type", "ATA", "--model_name", f"ATA_{arm}",
                "--pred_len", "96", "--num_epochs", str(args.num_epochs),
                "--n_trials", "1", "--multiseed", "True",
                "--d_model_choices", "32", "--stack_choices", "1",
                "--out_dir", args.out_dir,
            ] + flags)


if __name__ == "__main__":
    main()
