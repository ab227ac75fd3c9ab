#!/usr/bin/env bash
# Round-4 converged two-sided ordering run, torch side (VERDICT r3 item 1).
#
# Trains the ACTUAL reference composition (reference modules.transformer +
# tests/_torch_gp_ref.py, the exact gpytorch math) to CONVERGENCE on the
# field-profile synthetic protocol at the largest CPU-feasible scale:
# 4k train windows, d_model 16, pred 24, up to 60 epochs with patience-10
# best-val early stop, 3 seeds x {no, iso, gp}.  Seed-major order so each
# completed seed yields a full 3-arm ordering.  The JAX side re-runs at the
# IDENTICAL scale via scripts/jax_converged_r4.sh.
#
# Anchor: /root/reference/forecast_denoising.py:81-105,
#         Supplementary_Results.pdf Tables 1-2 (the published D-GP-first
#         ordering this run tests at convergence).
set -u
cd "$(dirname "$0")/.."
OUT_DIR=${OUT_DIR:-results_r4/torch_converged}
mkdir -p "$OUT_DIR"
for seed in 8220 2914 1122; do
  for variant in no iso gp; do
    echo "=== torch converged: seed $seed variant $variant ==="
    python scripts/ablation_torch_side.py \
      --variant "$variant" --seed "$seed" \
      --synthetic_profile field --synthetic_noise gp \
      --train_windows 4096 --valid_windows 512 \
      --epochs 60 --patience 10 --min_epochs 20 \
      --pred_len 24 --d_model 16 \
      --out "$OUT_DIR/torch_converged.jsonl" \
      --out_dir "$OUT_DIR" \
      || echo "FAILED: seed $seed variant $variant"
  done
done
echo "=== torch converged run complete ==="
