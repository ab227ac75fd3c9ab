"""Real-data parity runner: the full BASELINE.md comparison as one command.

``make parity`` (VERDICT r3 item 3): verifies the real csvs against the
manifest (schema + trust-on-first-use sha256), runs the reference's
headline protocols through the production CLI, compares every configured
cell against the published BASELINE.md numbers within the BASELINE.json
north-star tolerance (1%), and writes ``PARITY_REAL.md``.

Protocols covered (anchors in BASELINE.md):
- the executed-notebook run: solar pred 24, ATA backbone, 3 arms
  {gp, iso, no} (``example_run.ipynb`` cell 8);
- the AutoDG grid: autoformer + D-GP on solar/electricity/traffic at
  horizons 24/48/72/96 (``Additional-baselines.pdf`` Table 1 /
  ``Supplementary_Results.pdf`` Table 1 D-GP column).

Offline dry run (zero egress — proves the pipeline end to end on
synthetic stand-ins; numbers are NOT comparable and the report says so):

    python scripts/parity_real.py --synthetic --quick

Real run (a machine with the processed csvs):

    python scripts/parity_real.py --csv_dir /path/to/csvs
    # expects <csv_dir>/{solar,electricity,traffic}.csv

NOTE: the shipped flagship default is m=512 inducing (round 4); the
reference's own config is m=256 — parity runs pass --num_inducing 256 so
the comparison is against the reference's exact configuration.
"""

from __future__ import annotations

import argparse
import csv
import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Published targets (BASELINE.md).  (mse, mae) or mse-only where the
# source table publishes no MAE.
NOTEBOOK_TARGETS = {  # solar pred 24, ATA backbone (example_run.ipynb cell 8)
    "ATA_gp": (0.493, 0.584),
    "ATA_iso": (0.513, 0.591),
    "ATA_no": (0.570, 0.636),
}
AUTODG_MSE_TARGETS = {  # Additional-baselines.pdf Table 1, AutoDG column
    "traffic": {24: 0.392, 48: 0.387, 72: 0.380, 96: 0.385},
    "electricity": {24: 0.165, 48: 0.188, 72: 0.209, 96: 0.211},
    "solar": {24: 0.446, 48: 0.546, 72: 0.666, 96: 0.713},
}
TOLERANCE = 0.01  # the BASELINE.json north star: within 1%


def run_cli(exp, pred_len, model_name, arm_flags, args, out_dir):
    cmd = [
        sys.executable, "-m",
        "fine_grained_gaussian_process_forcasting_tpu.train.cli",
        "--exp_name", exp, "--pred_len", str(pred_len),
        "--model_name", model_name, "--n_seeds", str(args.n_seeds),
        "--num_inducing", "256",  # the reference's exact config
        "--out_dir", out_dir,
    ] + arm_flags
    if args.synthetic:
        cmd += ["--synthetic", "--synthetic_noise", "gp",
                "--synthetic_profile", "field"]
    if args.quick:
        cmd += ["--n_trials", "1", "--num_epochs", "2",
                "--max_train_samples", "256"]
    print("::", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    return r.returncode == 0


def read_errors(out_dir, exp, model_prefix):
    """Mean MSE/MAE over the seed rows of reported_errors_{exp}.csv whose
    model name starts with model_prefix (the harness's reporting file,
    reference train.py:231-244 format)."""
    path = os.path.join(out_dir, f"reported_errors_{exp}.csv")
    if not os.path.exists(path):
        return None
    mses, maes = [], []
    with open(path) as f:
        for row in csv.reader(f):
            if not row or not row[0].startswith(model_prefix):
                continue
            # harness format (reference train.py:231-244):
            # model_name, "mse mse_std", "mae mae_std"
            try:
                mses.append(float(row[1].split()[0]))
                maes.append(float(row[2].split()[0]))
            except (IndexError, ValueError):
                continue
    if not mses:
        return None
    return sum(mses) / len(mses), sum(maes) / len(maes)


def fmt_row(cells):
    return "| " + " | ".join(str(c) for c in cells) + " |"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--csv_dir", default="",
                   help="directory holding the processed real csvs")
    p.add_argument("--synthetic", action="store_true",
                   help="offline dry run on synthetic stand-ins")
    p.add_argument("--quick", action="store_true",
                   help="tiny budget (pipeline proof, not accuracy)")
    p.add_argument("--n_seeds", type=int, default=3)
    p.add_argument("--datasets", default="solar,electricity,traffic")
    p.add_argument("--horizons", default="24,48,72,96")
    p.add_argument("--out", default=os.path.join(REPO, "PARITY_REAL.md"))
    p.add_argument("--work_dir",
                   default=os.path.join(REPO, "results_parity"))
    args = p.parse_args()

    if not args.synthetic and not args.csv_dir:
        p.error("either --csv_dir (real run) or --synthetic (dry run)")

    datasets = [d for d in args.datasets.split(",") if d]
    horizons = [int(h) for h in args.horizons.split(",") if h]
    os.makedirs(args.work_dir, exist_ok=True)

    # 1. manifest verification + install (real mode)
    manifest_reports = []
    if not args.synthetic:
        from fine_grained_gaussian_process_forcasting_tpu.data import (
            manifest,
        )

        for exp in datasets:
            src = os.path.join(args.csv_dir, f"{exp}.csv")
            rep = manifest.verify_csv(exp, src)
            manifest.install_local_csv(exp, src)
            manifest_reports.append(rep)
            print(f":: manifest {exp}: sha256 {rep['sha256'][:12]}… "
                  f"({rep['pin_origin']})", flush=True)

    lines = [
        "# PARITY_REAL — BASELINE.md comparison run",
        "",
        f"Generated by `scripts/parity_real.py` on "
        f"{datetime.date.today().isoformat()}.",
        "",
    ]
    if args.synthetic:
        lines += [
            "**OFFLINE DRY RUN** on synthetic stand-ins (this environment "
            "has zero egress). Numbers below are **not comparable** to the "
            "published real-data targets — this run proves the one-command "
            "pipeline (manifest → CLI → grid → report) end to end. Re-run "
            "with `--csv_dir` on a machine with the real csvs for the "
            "actual parity check.",
            "",
        ]
    if args.quick:
        lines += ["(Quick budget: tiny windows/epochs — pipeline proof "
                  "only.)", ""]
    for rep in manifest_reports:
        lines.append(f"- manifest {rep['experiment']}: `{rep['sha256']}` "
                     f"({rep['pin_origin']})")
    if manifest_reports:
        lines.append("")

    all_ok = True

    # 2. the executed-notebook protocol (solar pred 24, ATA, 3 arms)
    if "solar" in datasets and 24 in horizons:
        nb_dir = os.path.join(args.work_dir, "notebook")
        os.makedirs(nb_dir, exist_ok=True)
        arms = {
            "ATA_gp": ["--attn_type", "ATA", "--denoising", "True",
                       "--gp", "True"],
            "ATA_iso": ["--attn_type", "ATA", "--denoising", "True",
                        "--gp", "False", "--iso", "True"],
            "ATA_no": ["--attn_type", "ATA", "--denoising", "False",
                       "--gp", "False"],
        }
        lines += ["## Executed-notebook protocol (solar, pred 24, ATA)",
                  "",
                  fmt_row(["arm", "ours MSE/MAE", "reference MSE/MAE",
                           "ΔMSE %", "within 1%"]),
                  fmt_row(["---"] * 5)]
        for arm, flags in arms.items():
            ok = run_cli("solar", 24, arm, flags, args, nb_dir)
            got = read_errors(nb_dir, "solar", arm) if ok else None
            tgt = NOTEBOOK_TARGETS[arm]
            if got is None:
                lines.append(fmt_row([arm, "RUN FAILED",
                                      f"{tgt[0]:.3f}/{tgt[1]:.3f}", "—",
                                      "NO"]))
                all_ok = False
                continue
            d = 100 * (got[0] - tgt[0]) / tgt[0]
            hit = abs(d) <= 100 * TOLERANCE
            all_ok &= (hit or args.synthetic)
            lines.append(fmt_row([
                arm, f"{got[0]:.3f}/{got[1]:.3f}",
                f"{tgt[0]:.3f}/{tgt[1]:.3f}", f"{d:+.1f}",
                "n/a (synthetic)" if args.synthetic
                else ("YES" if hit else "NO")]))
        lines.append("")

    # 3. the AutoDG grid (autoformer + D-GP, datasets x horizons)
    lines += ["## AutoDG grid (autoformer + GP denoise, D-GP column)", "",
              fmt_row(["dataset", "horizon", "ours MSE",
                       "reference MSE", "Δ %", "within 1%"]),
              fmt_row(["---"] * 6)]
    for exp in datasets:
        targets = AUTODG_MSE_TARGETS.get(exp, {})
        for h in horizons:
            if h not in targets:
                continue
            tag = f"AutoDG_{exp}_{h}"
            g_dir = os.path.join(args.work_dir, tag)
            os.makedirs(g_dir, exist_ok=True)
            ok = run_cli(exp, h, tag,
                         ["--attn_type", "autoformer", "--denoising",
                          "True", "--gp", "True"], args, g_dir)
            got = read_errors(g_dir, exp, tag) if ok else None
            tgt = targets[h]
            if got is None:
                lines.append(fmt_row([exp, h, "RUN FAILED", f"{tgt:.3f}",
                                      "—", "NO"]))
                all_ok = False
                continue
            d = 100 * (got[0] - tgt) / tgt
            hit = abs(d) <= 100 * TOLERANCE
            all_ok &= (hit or args.synthetic)
            lines.append(fmt_row([
                exp, h, f"{got[0]:.3f}", f"{tgt:.3f}", f"{d:+.1f}",
                "n/a (synthetic)" if args.synthetic
                else ("YES" if hit else "NO")]))
    lines += ["",
              f"**Overall:** "
              f"{'pipeline green (synthetic dry run)' if args.synthetic else ('PARITY MET' if all_ok else 'PARITY NOT MET')}",
              ""]

    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f":: wrote {args.out}", flush=True)
    return 0 if all_ok or args.synthetic else 1


if __name__ == "__main__":
    raise SystemExit(main())
