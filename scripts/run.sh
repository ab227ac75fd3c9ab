#!/usr/bin/env bash
# Reference ``run.sh:1-7`` equivalent: the 3-seed solar ablation driver
# (GP denoise / isotropic denoise / no denoise with the ATA backbone).
# Add --synthetic to run offline on generated data.
set -e
EXTRA="${@}"

python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
  --exp_name solar --model_name ATA_gp --attn_type ATA \
  --denoising True --gp True $EXTRA
python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
  --exp_name solar --model_name ATA_iso --attn_type ATA \
  --denoising True --gp False --iso True $EXTRA
python -m fine_grained_gaussian_process_forcasting_tpu.train.cli \
  --exp_name solar --model_name ATA_no --attn_type ATA \
  --denoising False --gp False $EXTRA
