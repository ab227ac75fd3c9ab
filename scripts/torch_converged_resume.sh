#!/usr/bin/env bash
# Resume wrapper for scripts/torch_converged_r4.sh: skips (seed, variant)
# arms already recorded in the output jsonl so the multi-hour CPU run can
# survive session boundaries (the driver ends builder sessions on a wall
# clock, not on job completion).  Seed-major order so each completed seed
# yields a full {no, iso, gp} ordering.
set -u
cd "$(dirname "$0")/.."
OUT_DIR=${OUT_DIR:-results_r4/torch_converged}
OUT="$OUT_DIR/torch_converged.jsonl"
mkdir -p "$OUT_DIR"
for seed in 8220 2914 1122; do
  for variant in no iso gp; do
    # Match fields independently so resume-skipping survives any change
    # to json.dumps key order / separators in ablation_torch_side.py.
    if [ -f "$OUT" ] && grep "\"variant\": \"$variant\"" "$OUT" | grep -Eq "\"seed\": $seed[,}]"; then
      echo "=== skip (done): seed $seed variant $variant ==="
      continue
    fi
    echo "=== torch converged: seed $seed variant $variant ($(date -u +%H:%M:%S)) ==="
    python scripts/ablation_torch_side.py \
      --variant "$variant" --seed "$seed" \
      --synthetic_profile field --synthetic_noise gp \
      --train_windows 4096 --valid_windows 512 \
      --epochs 60 --patience 10 --min_epochs 20 \
      --pred_len 24 --d_model 16 \
      --out "$OUT" --out_dir "$OUT_DIR" \
      || echo "FAILED: seed $seed variant $variant"
  done
done
echo "=== torch converged run complete ==="
