"""Round-4 InfoDG root-cause ablation (VERDICT r3 item 2).

The r3 informer six-treatment grid (results_r3/abl_field_info6_run.log)
has the D-GP arm LAST but one (mean MSE 0.522) while D-Iso wins (0.350)
and even No-D (0.435) beats it — the published grids
(/root/reference/Additional-results-higher-number-parameters.pdf Table 1)
have InfoDG first.  D-Pred (denoise, no noise) at 0.408 already beats
D-GP, so the regression is caused by what D-GP adds on top of a clean
denoiser pass: (a) the GP-blur mean added to the hidden states, and/or
(b) the ELBO term in the joint loss.  These arms decompose exactly that:

- gp_lam0:   GP blur, ELBO weight clipped to 0   -> isolates (a)
- gp_none:   ELBO term, no blur (gp_inject=none) -> isolates (b)
- gp_dec:    blur the decoder stream only        -> injection point
- gp_m512:   the promoted flagship inducing count (r3 ran m=256)
- gp_lsauto: activated kernel (sqrt(2d) lengthscale init)

All arms: field-profile solar, pred 96, 50 epochs, 3 vmapped seeds
{8220, 2914, 1122}, HPO pinned d_model 32 / stack 1, m=256 unless the
arm says otherwise — identical to the r3 grid so means are comparable.

Usage: python scripts/informer_rootcause_r4.py [--arms a,b] [--out_dir ..]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = ["--denoising", "True", "--gp", "True", "--num_inducing", "256"]
ARMS = {
    "gp_lam0": BASE + ["--lam_clip_max", "0.0"],
    "gp_none": BASE + ["--gp_inject", "none"],
    "gp_dec": BASE + ["--gp_inject", "dec"],
    "gp_m512": ["--denoising", "True", "--gp", "True",
                "--num_inducing", "512"],
    "gp_lsauto": BASE + ["--gp_ls_init", "auto"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="results_r4/info_rootcause")
    p.add_argument("--arms", default="gp_lam0,gp_none,gp_dec,gp_m512")
    p.add_argument("--num_epochs", type=int, default=50)
    args = p.parse_args()

    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    os.makedirs(args.out_dir, exist_ok=True)
    for arm in args.arms.split(","):
        print(f"=== informer root-cause arm: {arm} ===", flush=True)
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
