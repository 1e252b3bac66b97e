#!/usr/bin/env bash
# Paper Table 1/2 reproduction recipes (mirrors scripts_paper/1D/cindm.sh of
# the reference, mapped onto cindm_tpu CLIs). Train once, then run the
# compositional design evaluations.
set -e

# Training (reference: 1e6 steps, batch 32, grad-accum 2 — README.md:69)
python -m cindm_tpu.cli.train_1d \
  --dataset nbody-2 --conditioned_steps 0 --rollout_steps 24 \
  --batch_size 32 --gradient_accumulate_every 2 --Unet_dim 64 \
  --train_num_steps 1000000 --save_and_sample_every 10000 \
  --n_sims 6000 --results_folder ./results/nbody-2

# Table 1: 2-body / 4-body generalization at 24 steps
for NB in 2 4; do
python -m cindm_tpu.cli.design_1d \
  --dataset nbody-2 --model_path ./results/nbody-2 \
  --compose_n_bodies $NB --n_composed 0 \
  --design_guidance standard-recurrence-10 --design_coef 0.2 --consistency_coef 0.2 \
  --batch_size 500 --sample_steps 1000
done

# Table 2: 8-body, composed horizons (34/44/54 steps via n_composed)
for NC in 1 2 3; do
python -m cindm_tpu.cli.design_1d \
  --dataset nbody-2 --model_path ./results/nbody-2 \
  --compose_n_bodies 8 --n_composed $NC --compose_start_step 4 \
  --design_guidance standard-recurrence-10 --design_coef 0.2 --consistency_coef 0.2 \
  --batch_size 500 --sample_steps 1000
done
