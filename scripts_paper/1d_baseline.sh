#!/usr/bin/env bash
# Baseline recipes (mirrors scripts_paper/1D/baseline.sh): backprop and CEM
# over the UNet forward model and GNS.
set -e

python -m cindm_tpu.cli.train_1d --method_type forward_model \
  --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
  --train_num_steps 200000 --results_folder ./results/nbody-2-forward

for METHOD in backprop CEM; do
  for MODEL in Unet GNS_autoregress; do
    python -m cindm_tpu.cli.design_1d_baseline \
      --design_method $METHOD --method_type $MODEL \
      --model_path ./results/nbody-2-forward \
      --n_bodies 2 --rollout_steps 23 --max_design_steps 1000 \
      --N 1000 --Ne 100
  done
done
