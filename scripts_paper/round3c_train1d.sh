#!/bin/bash
# Round-3c (post-artifact-loss session): retrain the collision-enriched 1D
# model from scratch on the surviving 6000-sim cache. Milestones every 5k
# steps so ANY stopping point yields a usable checkpoint for the 8-body
# sweep. Relaunches with --resume True on tunnel wedge (known infra
# failure: process blocks in a device call with zero CPU and no log).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
STALL=${STALL:-300}
MAX_STEPS=${MAX_STEPS:-200000}

run_once() {
  python -m cindm_tpu.cli.train_1d \
    --dataset nbody-2 --conditioned_steps 0 --rollout_steps 24 \
    --batch_size 512 --gradient_accumulate_every 1 --Unet_dim 64 \
    --train_num_steps "$MAX_STEPS" --save_and_sample_every 5000 \
    --n_sims 6000 --test_sims 100 --collision_frac 0.3 \
    --steps_per_launch 25 --log_every 100 \
    --results_folder ./results/nbody2_coll --resume "$1" \
    >> /tmp/r3c_train1d.log 2>&1 &
  echo $! > /tmp/r3c_train1d.pid
}

resume=False
while :; do
  run_once "$resume"; resume=True
  pid=$(cat /tmp/r3c_train1d.pid)
  last_sz=-1; last_prog=$SECONDS
  while kill -0 "$pid" 2>/dev/null; do
    sleep 20
    sz=$(stat -c %s /tmp/r3c_train1d.log 2>/dev/null || echo 0)
    if [ "$sz" != "$last_sz" ]; then last_sz=$sz; last_prog=$SECONDS
    elif [ $((SECONDS - last_prog)) -ge "$STALL" ]; then
      echo "WD: trainer wedged (no log ${STALL}s), relaunching" >> /tmp/r3c_train1d.log
      kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null; rc=$?
  [ "$rc" -eq 0 ] && { echo "TRAIN1D_DONE" >> /tmp/r3c_train1d.log; break; }
  [ -f /tmp/r3c_stop ] && { echo "TRAIN1D_STOPPED" >> /tmp/r3c_train1d.log; break; }
  sleep 5
done
