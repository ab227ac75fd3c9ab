"""Comparison figures from the pred-96 ablation checkpoints.

Reference ``evaluate.py`` / ``forecasting-figs.py`` equivalents, driven
over the run.sh ablation's per-seed best checkpoints: per-timestep error
bars and forecast overlays for ATA_gp / ATA_iso / ATA_no.

Usage: python scripts/abl96_figures.py [--ckpt_dir results_r2/abl96_low]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fine_grained_gaussian_process_forcasting_tpu.data.synthetic import (
    make_synthetic_frame,
)
from fine_grained_gaussian_process_forcasting_tpu.train.evaluate_checkpoints import (
    EvalArgs,
    evaluate_checkpoints,
    plot_forecasts,
    plot_per_step_errors,
)

VARIANTS = (
    ("ATA_gp", dict(denoising=True, gp=True, iso=False)),
    ("ATA_iso", dict(denoising=True, gp=False, iso=True)),
    ("ATA_no", dict(denoising=False, gp=False, iso=False)),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_dir", default="results_r2/abl96_low")
    parser.add_argument("--out_dir", default="results_r2")
    parser.add_argument("--seeds", type=int, nargs="+",
                        default=[8220, 2914, 1122])
    parser.add_argument("--profile", default="stationary",
                        help="synthetic profile the ablation trained on "
                             "(train/cli.py --synthetic_profile)")
    parser.add_argument("--d_models", type=int, nargs="+", default=[16, 32],
                        help="HPO grid actually trained (a pinned-grid run "
                             "needs only its own combo — avoids compiling "
                             "restore attempts for absent checkpoints)")
    parser.add_argument("--stacks", type=int, nargs="+", default=[1, 3])
    parser.add_argument("--extra_arm", action="append", default=[],
                        help="extra GP arm to overlay, as "
                             "prefix:ckpt_dir:num_inducing[:h1,h2] — e.g. "
                             "ATA_gp512:results_r3/abl_field_gp512:512 or "
                             "ATA_gpdeep:results_r3/abl_field_gpdeep:512:8")
    args = parser.parse_args()

    import numpy as np

    # the ablation trained on this exact frame (train/cli.py --synthetic)
    raw = make_synthetic_frame("solar", num_entities=8,
                               steps_per_entity=1600, seed=0, noise="gp",
                               profile=args.profile)
    variants = [(p, args.ckpt_dir, f) for p, f in VARIANTS]
    for spec in args.extra_arm:
        parts = spec.split(":")
        prefix, ckpt_dir, m = parts[0], parts[1], int(parts[2])
        hidden = (tuple(int(x) for x in parts[3].split(",") if x)
                  if len(parts) > 3 else ())
        variants.append((prefix, ckpt_dir,
                         dict(denoising=True, gp=True, iso=False,
                              num_inducing=m, gp_hidden_dims=hidden)))
    merged = {}
    for prefix, ckpt_dir, flags in variants:
        eargs = EvalArgs(
            exp_name="solar", pred_len=96, seeds=tuple(args.seeds),
            attn_types=("ATA",), d_models=tuple(args.d_models),
            stack_sizes=tuple(args.stacks),
            model_prefix=prefix,
            out_dir=ckpt_dir,
            max_samples=256, batch_size=64,
            **flags,
        )
        res = evaluate_checkpoints(raw, eargs)
        if not res:
            continue
        # 3-seed protocol: mean error curves; overlay from the median seed
        per_seed = list(res.values())
        median = sorted(per_seed, key=lambda r: r["mse"])[len(per_seed) // 2]
        merged[prefix] = {
            "per_step_mse": np.mean([r["per_step_mse"] for r in per_seed], 0),
            "per_step_mae": np.mean([r["per_step_mae"] for r in per_seed], 0),
            "mse": float(np.mean([r["mse"] for r in per_seed])),
            "mae": float(np.mean([r["mae"] for r in per_seed])),
            "predictions": median["predictions"],
            "test_y": median["test_y"],
        }
        print(f"{prefix}: {len(per_seed)}-seed mean "
              f"MSE {merged[prefix]['mse']:.3f} MAE {merged[prefix]['mae']:.3f}")
    os.makedirs(args.out_dir, exist_ok=True)
    tag = "solar_" + os.path.basename(args.ckpt_dir.rstrip("/"))
    p1 = plot_per_step_errors(merged, tag, out_dir=args.out_dir)
    p2 = plot_forecasts(merged, tag, out_dir=args.out_dir)
    p3 = plot_per_step_errors(merged, tag, out_dir=args.out_dir,
                              metric="per_step_mae")
    print("figures:", p1, p2, p3)


if __name__ == "__main__":
    main()
