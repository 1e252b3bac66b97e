#!/bin/bash
# Round-3c phase 2: after stopping the fresh collision-enriched trainer at
# the latest 5k milestone, run (in VERDICT round-2 priority order, every
# step timeout-bounded so the chip is free for the driver's bench):
#   1. 8-body guidance sweep (VERDICT #2)          -> results/designs/sweep8.json
#   2. winner confirmation at batch 64             -> results/designs/8body_T54_winner_b64.json
#   3. paper-protocol CinDM tables at batch 500    -> results/tables_paper.json   (VERDICT #5)
#   4. roofline attribution                        -> /tmp/r3_roofline.log        (VERDICT #8)
#   5. multibody EBM-compose analysis              -> results/designs/analysis_multibody.json (VERDICT #9)
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }
done_rec() { [ -s "$1" ] && { echo "=== skip (have $1)"; return 0; } || return 1; }

# ---- 0. stop the trainer cleanly (milestones are every 5k ~ 100 s) ----
if [ -f /tmp/r3c_train1d.pid ]; then
  touch /tmp/r3c_stop
  pid=$(cat /tmp/r3c_train1d.pid)
  kill "$pid" 2>/dev/null; sleep 20; kill -9 "$pid" 2>/dev/null
  sleep 5
fi
MILESTONE=$(ls results/nbody2_coll 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$MILESTONE" ] || { echo "FATAL: no milestone in results/nbody2_coll"; exit 1; }
echo "=== using milestone $MILESTONE"

# ---- 1. 8-body guidance sweep (recurrence fixed at 10: one compile) ----
if ! done_rec results/designs/sweep8.json; then
  timeout 3000 python benchmarks/run_sweep8.py \
    --model_path ./results/nbody2_coll --batch_size 32 \
    --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 --recurrences 10 \
    --out ./results/designs/sweep8.json > /tmp/r3_sweep8.log 2>&1
  status sweep8 $?
fi

# ---- 2. confirm winner at batch 64 ----
if ! done_rec results/designs/8body_T54_winner_b64.json; then
  timeout 1500 python benchmarks/confirm_sweep8.py \
    --model_path ./results/nbody2_coll > /tmp/r3_sweep8_confirm.log 2>&1
  status sweep8_confirm $?
fi

# ---- 3. paper-protocol CinDM tables at batch 500 ----
if ! done_rec results/tables_paper.json; then
  timeout 4200 python benchmarks/run_tables_paper.py \
    --diffusion_path ./results/nbody2_coll --batch_size 500 \
    --flagship_batch 128 --skip_baselines \
    --flagship_winner results/designs/8body_T54_winner_b64.json \
    --out ./results/tables_paper.json > /tmp/r3_tables.log 2>&1
  status tables_cindm $?
fi

# ---- 4. roofline attribution ----
[ -f /tmp/r3_roofline.done ] || {
  timeout 1500 python benchmarks/bench_roofline.py > /tmp/r3_roofline.log 2>&1
  rc=$?; status roofline $rc; [ "$rc" -eq 0 ] && touch /tmp/r3_roofline.done; }

# ---- 5. multibody EBM-compose analysis (uncond 1-body prior + compare) ----
if ! done_rec results/designs/analysis_multibody.json; then
  if [ ! -d results/nbody1_uncond ] || \
     ! ls results/nbody1_uncond | grep -qE '^[0-9]+$'; then
    timeout 1800 python -m cindm_tpu.cli.train_1d \
      --n_bodies 1 --conditioned_steps 0 --rollout_steps 24 \
      --n_sims 6000 --test_sims 100 --batch_size 256 --steps_per_launch 25 \
      --train_num_steps 20000 --save_and_sample_every 10000 --log_every 1000 \
      --results_folder ./results/nbody1_uncond > /tmp/r3_uncond.log 2>&1
    status uncond_train $?
  fi
  timeout 1800 python -m cindm_tpu.cli.analysis_1d \
    --model_path ./results/nbody2_coll --compose_multibodies 4 \
    --uncond_model_path ./results/nbody1_uncond \
    --batch_size 16 --sample_steps 250 --n_sims 16 \
    --out results/designs/analysis_multibody.json > /tmp/r3_multibody.log 2>&1
  status multibody $?
fi

echo PHASE2_DONE
