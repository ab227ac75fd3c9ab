"""Round-4 exact-GP-blur tuning sweep (VERDICT r3 item 9).

The round-3 precision fix made the exact blur stable (3/3 seeds finite),
but it still trails the variational blur on the field protocol (0.225 vs
0.188 mean MSE) and no post-fix tuning was attempted.  The two candidate
handicaps, both baked into the reference-parity raw-zeros init:

- noise init ~0.693: a huge likelihood floor vs. the kernel's unit
  outputscale — the posterior mean m = K (K + noise I)^{-1} z shrinks
  toward zero, so the blur starts nearly inert AND the exact MLL's
  data-fit term is drowned.
- lengthscale init ~0.693 in d=32: same born-inert geometry as the
  variational kernel (PARITY.md) — |x/ls|^2 distances ~ 2d/ls^2 >> 1,
  K is ~diagonal.

One sweep over {noise_init x ls_init} at the field full-data protocol
(pred 96, autoformer backbone, 50 epochs, 3 vmapped seeds, d32/stack1).
NOTE (round-5 harvest): the results_r3 exact-blur row (0.225) was
measured on the ATA backbone, so this sweep's own 'ref' arm is the
same-code anchor here; the autoformer variational comparator is the
r3 dataset-grid solar D-GP row (0.188).  See RESULTS.md round 5.

Usage: python scripts/exact_blur_sweep_r4.py [--arms ...] [--out_dir ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, noise_init, ls_init): 0.0 = reference raw-zeros init
ARMS = {
    "ref": ("0.0", "0"),           # r3 row, re-run for a same-code anchor
    "n01": ("0.1", "0"),           # small noise floor, inert kernel
    "n01_lsauto": ("0.1", "auto"),  # small noise + engaged kernel
    "lsauto": ("0.0", "auto"),     # engaged kernel, reference noise
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="results_r4/exact_sweep")
    p.add_argument("--arms", default="n01,n01_lsauto,lsauto")
    p.add_argument("--num_epochs", type=int, default=50)
    args = p.parse_args()

    from fine_grained_gaussian_process_forcasting_tpu.train import cli

    os.makedirs(args.out_dir, exist_ok=True)
    for arm in args.arms.split(","):
        noise, ls = ARMS[arm]
        print(f"=== exact-blur sweep arm: {arm} "
              f"(noise_init={noise} ls_init={ls}) ===", flush=True)
        cli.main([
            "--exp_name", "solar", "--synthetic",
            "--synthetic_profile", "field", "--synthetic_noise", "gp",
            "--attn_type", "autoformer", "--model_name", f"Exact_{arm}",
            "--pred_len", "96", "--num_epochs", str(args.num_epochs),
            "--n_trials", "1", "--multiseed", "True",
            "--d_model_choices", "32", "--stack_choices", "1",
            "--denoising", "True", "--gp", "True", "--gp_kind", "exact",
            "--exact_noise_init", noise, "--gp_ls_init", ls,
            "--out_dir", args.out_dir,
        ])


if __name__ == "__main__":
    main()
