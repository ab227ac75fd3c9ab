#!/usr/bin/env bash
# Golden run: the full BASELINE.md comparison protocol in one command.
#
# Reproduces the reference's headline experiment (example_run.ipynb cells
# 5-9 + run.sh:1-7): the solar 3-seed ATA ablation {gp, iso, no-denoise}
# at pred_len 24, followed by checkpoint evaluation.  The north star is
# test MSE/MAE within 1% of the notebook's recorded outputs
# (ATA_gp 0.493/0.584, ATA_iso 0.513/0.591, ATA_no 0.570/0.636).
#
# Usage:
#   REAL data (machine with the processed solar.csv):
#       scripts/golden_run.sh --csv /path/to/solar.csv
#     The csv is schema- and (when pinned) checksum-verified via
#     data.manifest before anything trains.
#   OFFLINE dry run (no egress — synthetic stand-in, proves the pipeline):
#       scripts/golden_run.sh --synthetic
#
# Results land in reported_errors_solar.csv + models_solar_24/.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE=""
CSV=""
EXTRA=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --csv) CSV="$2"; shift 2 ;;
    --synthetic) MODE="synthetic"; shift ;;
    *) EXTRA+=("$1"); shift ;;
  esac
done

if [[ -n "$CSV" ]]; then
  echo "== verifying $CSV against the manifest =="
  python -m fine_grained_gaussian_process_forcasting_tpu.data.manifest \
    verify solar "$CSV"
  python -m fine_grained_gaussian_process_forcasting_tpu.data.download \
    --expt_name solar --from_local_csv "$CSV"
  DATA_ARGS=()
elif [[ "$MODE" == "synthetic" ]]; then
  echo "== offline mode: synthetic schema-matching stand-in =="
  DATA_ARGS=(--synthetic --synthetic_noise gp)
else
  echo "usage: $0 [--csv /path/to/solar.csv | --synthetic] [extra cli flags]" >&2
  exit 2
fi

# The reference protocol: pred_len 24, 3 seeds from meta-seed 1234,
# Optuna-equivalent HPO grid, 50 epochs (train.py:247-280 defaults).
COMMON=(--exp_name solar --pred_len 24 --n_seeds 3 "${DATA_ARGS[@]}" "${EXTRA[@]}")

python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
  --model_name ATA_gp --attn_type ATA --denoising True --gp True \
  "${COMMON[@]}"
python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
  --model_name ATA_iso --attn_type ATA --denoising True --gp False --iso True \
  "${COMMON[@]}"
python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
  --model_name ATA_no --attn_type ATA --denoising False --gp False \
  "${COMMON[@]}"

echo "== reported errors =="
cat reported_errors_solar.csv
echo
echo "Reference targets (example_run.ipynb cell 8):"
echo "  ATA_gp  MSE 0.493 / MAE 0.584"
echo "  ATA_iso MSE 0.513 / MAE 0.591"
echo "  ATA_no  MSE 0.570 / MAE 0.636"
