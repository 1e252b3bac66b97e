#!/usr/bin/env bash
# Table 3 recipes: airfoil diffusion training + multi-boundary design with
# closed-loop BDIM lift/drag scoring (replaces the LilyPad/Java loop).
set -e

python -m cindm_tpu.cli.train_2d \
  --cond_frames 2 --pred_frames 4 --ts 4 --batch_size 48 \
  --train_num_steps 500000 --is_testdata False --n_sims 1000 \
  --results_folder ./results/airfoil

for NB in 1 2 3; do
python -m cindm_tpu.cli.design_2d \
  --model_path ./results/airfoil --num_boundaries $NB \
  --batch_size 20 --design_guidance standard-alpha \
  --coeff_ratio 2e-4 --evaluate True
done
