#!/usr/bin/env bash
# 2D baseline recipes (mirrors the 8 inference/baseline/inverse_design_
# {GD,CEM}_discrete_{fno,lepde}[_twobds].py scripts): GD and CEM over FNO
# and LE-PDE surrogates, 1 and 2 boundaries.
set -e

# surrogate training
python -m cindm_tpu.cli.train_baseline --algo fno   --results_folder ./results/fno
python -m cindm_tpu.cli.train_baseline --algo lepde --results_folder ./results/lepde
python -m cindm_tpu.cli.train_force --results_folder ./results/force

for METHOD in GD CEM; do
  for SUR in fno lepde; do
    for NB in 1 2; do
      python -m cindm_tpu.cli.design_2d_baseline \
        --design_method $METHOD --surrogate $SUR --num_boundaries $NB \
        --surrogate_path ./results/$SUR --force_model_path ./results/force \
        --optim_iter 100 --lr 1e-4
    done
  done
done
