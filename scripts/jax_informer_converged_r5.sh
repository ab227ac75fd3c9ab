#!/usr/bin/env bash
# Round-5 converged ordering run on the INFORMER backbone, JAX side
# (VERDICT r4 item 7): the jax_converged_r4.sh protocol moved to the
# InfoDG configuration (informer backbone, pred 96, d_model 32 — the
# published Additional-results-higher-number-parameters.pdf Table 1
# shape), 60-epoch budget, 4096/512 windows, 3 seeds, m=256.
#
# The torch half of this protocol did NOT fit round 5's CPU budget
# (ablation_torch_side.py is ATA-pinned and each pred-96 informer arm
# is multi-hour on this 1-CPU host); this gives the JAX-side converged
# ordering so a future torch run has its comparison table ready.
set -u
cd "$(dirname "$0")/.."
OUT_DIR=${OUT_DIR:-results_r5/jax_informer_converged}
mkdir -p "$OUT_DIR"

run_arm () {  # name, extra flags...
  local name=$1; shift
  echo "=== jax informer converged arm: $name ==="
  python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
    --exp_name solar --pred_len 96 --attn_type informer \
    --model_name "Info_${name}_conv" \
    --synthetic --synthetic_profile field --synthetic_noise gp \
    --max_train_samples 4096 --max_valid_samples 512 \
    --num_epochs 60 --n_trials 1 \
    --d_model_choices 32 --stack_choices 1 \
    --num_inducing 256 --n_seeds 3 \
    --out_dir "$OUT_DIR" "$@" \
    || echo "FAILED: arm $name"
}

run_arm no  --denoising False --gp False
run_arm iso --denoising True  --gp False --iso True
run_arm gp  --denoising True  --gp True
# the round-5 root-cause winner, at the same converged budget
run_arm gpnone --denoising True --gp True --gp_inject none
echo "=== jax informer converged run complete ==="
