#!/usr/bin/env bash
# Table 3 recipes: airfoil diffusion training + multi-boundary design with
# closed-loop BDIM lift/drag scoring (replaces the LilyPad/Java loop).
# Round-3 protocol: 1024 BDIM sims, 200k steps, remat to fit the
# device-resident dataset beside the model in 16G HBM.
set -e

python -m cindm_tpu.cli.train_2d \
  --cond_frames 2 --pred_frames 4 --ts 4 --batch_size 48 \
  --train_num_steps 200000 --is_testdata False --n_sims 1024 \
  --data_cache dataset/airfoil_1024 --device_data True --remat True \
  --steps_per_launch 25 --save_and_sample_every 20000 \
  --results_folder ./results/airfoil_long --resume True

python -m cindm_tpu.cli.train_force --is_testdata False --n_sims 1024 \
  --data_cache dataset/airfoil_1024 --train_num_steps 8000 \
  --results_folder ./results/force_long

for NB in 1 2 3; do
python -m cindm_tpu.cli.design_2d \
  --model_path ./results/airfoil_long --force_model_path ./results/force_long \
  --num_boundaries $NB \
  --batch_size 16 --design_guidance standard-alpha \
  --coeff_ratio 2e-4 --evaluate True
done
