#!/usr/bin/env bash
# Baseline recipes (mirrors scripts_paper/1D/baseline.sh +
# inference/inverse_design_1d_baseline.py): backprop and CEM over the four
# forward surrogates, each with its own trained checkpoint.
set -e

python -m cindm_tpu.cli.train_1d --method_type forward_model \
  --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
  --train_num_steps 200000 --results_folder ./results/nbody-2-forward

python -m cindm_tpu.cli.train_1d --method_type Unet_rollout_one \
  --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
  --train_num_steps 200000 --results_folder ./results/nbody-2-rollout-one

python -m cindm_tpu.cli.train_1d --method_type GNS_cond_one \
  --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
  --train_num_steps 100000 --results_folder ./results/nbody-2-gns-cond-one

python -m cindm_tpu.cli.train_1d --method_type GNS_direct \
  --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
  --train_num_steps 100000 --results_folder ./results/nbody-2-gns-direct

declare -A CKPT=(
  [Unet]=./results/nbody-2-forward
  [Unet_single_step]=./results/nbody-2-rollout-one
  [GNS_autoregress]=./results/nbody-2-gns-cond-one
  [GNS_direct]=./results/nbody-2-gns-direct
)

for METHOD in backprop CEM; do
  for MODEL in Unet Unet_single_step GNS_autoregress GNS_direct; do
    python -m cindm_tpu.cli.design_1d_baseline \
      --design_method $METHOD --method_type $MODEL \
      --model_path "${CKPT[$MODEL]}" \
      --n_bodies 2 --rollout_steps 23 --max_design_steps 1000 \
      --N 1000 --Ne 100
  done
done
