#!/usr/bin/env bash
# Round-4 converged two-sided ordering run, JAX side (VERDICT r3 item 1).
#
# The exact protocol of scripts/torch_converged_r4.sh, re-run through the
# production harness: field-profile solar, 4096 train / 512 valid
# windows, d_model 16 / stack 1 pinned (the torch side's config), ATA
# backbone, pred 24, 60-epoch budget with best-val checkpointing, 3 seeds
# (meta-seed 1234 -> 8220/2914/1122, matching run.sh), m=256 (the
# reference's own inducing count — this is a reference-ordering test,
# not a flagship-config test).
set -u
cd "$(dirname "$0")/.."
OUT_DIR=${OUT_DIR:-results_r4/jax_converged}
mkdir -p "$OUT_DIR"

run_arm () {  # name, extra flags...
  local name=$1; shift
  echo "=== jax converged arm: $name ==="
  python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
    --exp_name solar --pred_len 24 --attn_type ATA \
    --model_name "ATA_${name}_conv" \
    --synthetic --synthetic_profile field --synthetic_noise gp \
    --max_train_samples 4096 --max_valid_samples 512 \
    --num_epochs 60 --n_trials 1 \
    --d_model_choices 16 --stack_choices 1 \
    --num_inducing 256 --n_seeds 3 \
    --out_dir "$OUT_DIR" "$@" \
    || echo "FAILED: arm $name"
}

run_arm no  --denoising False --gp False
run_arm iso --denoising True  --gp False --iso True
run_arm gp  --denoising True  --gp True
echo "=== jax converged run complete ==="
