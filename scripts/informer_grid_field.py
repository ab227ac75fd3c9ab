"""Informer-backbone six-treatment grid at the field full-data protocol.

The Supplementary_Results.pdf Table 2 shape (Informer x {No-D, D-GP,
D-Pred, Res-Boos, D-Iso, D-C-Input}) on the same field-profile protocol
as the Autoformer/ATA grids in RESULTS.md: formatter-default windows,
pred 96, 50 epochs, 3 vmapped seeds {8220, 2914, 1122}, HPO pinned to
d_model 32 / stack 1.  The D-GP arm already exists
(results_r3/abl_field_info); this drives the remaining five.

Usage: python scripts/informer_grid_field.py [--out_dir ...] [--arms a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "no": ["--denoising", "False", "--gp", "False"],
    "iso": ["--denoising", "True", "--gp", "False", "--iso", "True"],
    "pred": ["--denoising", "True", "--gp", "False", "--no-noise", "True"],
    "res": ["--denoising", "True", "--gp", "True", "--residual", "True"],
    "cinput": ["--gp", "True", "--input_corrupt_training", "True"],
    "gp": ["--denoising", "True", "--gp", "True"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="results_r3/abl_field_info6")
    p.add_argument("--arms", default="no,iso,pred,res,cinput")
    p.add_argument("--num_epochs", type=int, default=50)
    args = p.parse_args()

    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    os.makedirs(args.out_dir, exist_ok=True)
    for arm in args.arms.split(","):
        print(f"=== informer arm: {arm} ===", flush=True)
        cli.main([
            "--exp_name", "solar", "--synthetic",
            "--synthetic_profile", "field", "--synthetic_noise", "gp",
            "--attn_type", "informer", "--model_name", f"Info_{arm}",
            "--pred_len", "96", "--num_epochs", str(args.num_epochs),
            "--n_trials", "1", "--multiseed", "True",
            "--d_model_choices", "32", "--stack_choices", "1",
            "--out_dir", args.out_dir,
        ] + ARMS[arm])


if __name__ == "__main__":
    main()
