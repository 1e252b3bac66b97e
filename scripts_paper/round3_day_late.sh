#!/bin/bash
# Late-relay variant of round3_day.sh: the 2D v2 chain FIRST (VERDICT #1),
# guided-DDIM designs to fit the shrunken window, sweep8 only if time
# remains. Same wd watchdog + idempotency. Assumes the v2 dataset and
# prep cache are already staged (CPU pre-generation, 06:35).
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export JAX_LOG_COMPILES=1
export CINDM_REQUIRE_TPU=1

QUEUE_END=${QUEUE_END:-"2026-08-18 13:20"}
END_S=$(date -u -d "$QUEUE_END" +%s)
left() { echo $(( END_S - $(date -u +%s) )); }
STALL=${STALL:-420}; GRACE=${GRACE:-90}
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }
wd() {
  local hard=$1 log=$2; shift 2
  local l; l=$(left)
  [ "$l" -le 120 ] && { echo "WD: past QUEUE_END, skipping: $*"; return 99; }
  [ "$hard" -gt "$l" ] && hard=$l
  "$@" > "$log" 2>&1 &
  local pid=$! t0=$SECONDS last_prog=$SECONDS last_cpu="" last_sz=-1
  while kill -0 "$pid" 2>/dev/null; do
    sleep 15
    local el=$((SECONDS - t0))
    if [ "$el" -ge "$hard" ]; then
      echo "WD: hard timeout ${hard}s, killing $pid"; kill "$pid"; sleep 5
      kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; return 124
    fi
    local cpu sz; cpu=$(cpu_ticks "$pid"); sz=$(stat -c %s "$log" 2>/dev/null || echo 0)
    if [ "$cpu" != "$last_cpu" ] || [ "$sz" != "$last_sz" ]; then
      last_prog=$SECONDS; last_cpu=$cpu; last_sz=$sz
    elif [ "$el" -gt "$GRACE" ] && [ $((SECONDS - last_prog)) -ge "$STALL" ]; then
      echo "WD: stalled ${STALL}s, killing $pid"
      kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      return 125
    fi
  done
  wait "$pid"; return $?
}
done_rec() { [ -s "$1" ] && { echo "=== skip (have $1)"; return 0; } || return 1; }

[ -f dataset/airfoil_1024_v2/fields.npy ] || { echo "FATAL: no v2 dataset"; exit 1; }

# ---- 1. ForceUnet on v2 ----
if [ ! -f results/force_v2/.done ]; then
  wd 1800 /tmp/r3_force_v2.log \
    python -m cindm_tpu.cli.train_force \
      --is_testdata False --n_sims 1024 --data_cache dataset/airfoil_1024_v2 \
      --train_num_steps 8000 --results_folder ./results/force_v2
  rc=$?; status force_v2 $rc
  [ "$rc" -eq 0 ] && touch results/force_v2/.done
fi

# ---- 2. 2D train until T-2.5h (designs+sweep reserve 9000s) ----
DESIGN_RESERVE=${DESIGN_RESERVE:-9000}
if [ ! -f results/airfoil_v2/.done ]; then
  while :; do
    budget=$(( $(left) - DESIGN_RESERVE ))
    [ "$budget" -le 300 ] && { echo "=== train2d budget exhausted"; break; }
    wd "$budget" /tmp/r3_train2d_v2.log \
      python -m cindm_tpu.cli.train_2d \
        --cond_frames 2 --pred_frames 4 --ts 4 --batch_size 48 \
        --train_num_steps ${TRAIN_STEPS:-100000} --is_testdata False \
        --n_sims 1024 --data_cache dataset/airfoil_1024_v2 \
        --device_data True --remat True --steps_per_launch 25 \
        --save_and_sample_every 5000 \
        --results_folder ./results/airfoil_v2 --resume True
    rc=$?; status train2d_v2 $rc
    [ "$rc" -eq 0 ] && { touch results/airfoil_v2/.done; break; }
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
fi
ls results/airfoil_v2/ 2>/dev/null | grep -q '^[0-9]*000$' || { echo "FATAL: no v2 prior"; exit 1; }

# ---- 3. designs: nb1 full protocol; nb>=2 ablations at guided DDIM-250 ----
d2() {  # name nb extra...
  local name=$1 nb=$2; shift 2
  done_rec "results/designs/r3v2_${name}.json" && return 0
  wd 1800 /tmp/r3_design_"$name".log \
    python -m cindm_tpu.cli.design_2d \
      --model_path ./results/airfoil_v2 --force_model_path ./results/force_v2 \
      --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
      --coeff_ratio 2e-4 --evaluate True "$@"
  status "design_$name" $?
  rec /tmp/r3_design_"$name".log results/designs/r3v2_"$name".json
}
d2 nb1 1
d2 nb2_sym 2 --lambda_separation 10 --init_sep 0.5 --ddim_steps 250
d2 nb2 2 --ddim_steps 250
d2 nb3_sym 3 --lambda_separation 10 --init_sep 0.5 --ddim_steps 250

# ---- 4. 8-body sweep + confirm if time remains ----
if ! done_rec results/designs/sweep8.json; then
  wd 2700 /tmp/r3_sweep8.log \
    python benchmarks/run_sweep8.py \
      --model_path ./results/nbody2_coll --milestone 210000 --batch_size 32 \
      --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 --recurrences 10 \
      --out ./results/designs/sweep8.json
  status sweep8 $?
fi
if ! done_rec results/designs/8body_T54_winner_b64.json; then
  wd 1500 /tmp/r3_sweep8_confirm.log python benchmarks/confirm_sweep8.py
  status sweep8_confirm $?
fi

# ---- 5. roofline ----
[ -f /tmp/r3_roofline.done ] || {
  wd 1500 /tmp/r3_roofline.log python benchmarks/bench_roofline.py
  rc=$?; status roofline $rc; [ "$rc" -eq 0 ] && touch /tmp/r3_roofline.done; }

echo LATE_QUEUE_DONE
