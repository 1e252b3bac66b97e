#!/bin/bash
# Multibody EBM-compose analysis record (VERDICT r2 #9 / missing #7):
# train the 1-body unconditional prior the classifier-free strategies need
# (the reference's model_unconditioned, diffusion_1d.py:1895-1901), then
# compare pairwise compose vs classifier-free ULA/UHMC on 4-body MAE
# (inference_1d_composing_multibodies.py). ~25 min of single-chip time.
set -eu
cd "$(dirname "$0")/.."

if [ ! -d results/nbody1_uncond/20000 ]; then  # idempotent under queue relaunch
  timeout 1500 python -m cindm_tpu.cli.train_1d \
    --dataset nbody-1 --conditioned_steps 0 --rollout_steps 24 \
    --n_sims 6000 --test_sims 100 --batch_size 256 \
    --gradient_accumulate_every 1 --steps_per_launch 25 \
    --train_num_steps 20000 --save_and_sample_every 10000 --log_every 1000 \
    --results_folder ./results/nbody1_uncond --resume True
fi

# round-4: the surviving/retrained prior lives in nbody2_coll (nbody2_paper
# was lost in the round-3 VM wipe)
timeout 1800 python -m cindm_tpu.cli.analysis_1d \
  --model_path ./results/nbody2_coll --compose_multibodies 4 \
  --uncond_model_path ./results/nbody1_uncond \
  --batch_size 16 --sample_steps 250 --n_sims 16 \
  --out results/designs/analysis_multibody.json

timeout 1800 python -m cindm_tpu.cli.analysis_1d \
  --model_path ./results/nbody2_coll --compose_multibodies 8 \
  --uncond_model_path ./results/nbody1_uncond \
  --batch_size 16 --sample_steps 250 --n_sims 16 \
  --out results/designs/analysis_multibody8.json
