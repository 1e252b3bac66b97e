#!/bin/bash
# Round-3 day queue (after the relay outage + the Poisson-BC fix).
#
# The projection BC fix (physics/bdim.py:_update_up, Neumann edge links)
# invalidates every 2D artifact generated before it: the 1024-sim dataset,
# the airfoil_long/force_long checkpoints, and the r3_nb* design records.
# This queue rebuilds the 2D chain on the corrected solver (v2 suffix) and
# then runs the remaining VERDICT round-2 items. 1D items (sweep8, tables,
# roofline) are unaffected by the fix.
#
# Serialized TPU steps (one process at a time on the axon tunnel), each
# under `wd` — a stall watchdog that kills a step when it makes no progress
# (no CPU ticks AND no log growth) for STALL seconds; the tunnel hard-wedges
# processes mid-device-call (observed 4x in round 3). Steps are idempotent:
# each is skipped when its record/marker exists, so the queue can be
# relaunched at any time.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export JAX_LOG_COMPILES=1   # compile-start lines count as log progress
export CINDM_REQUIRE_TPU=1  # fail instantly if the axon relay is down

QUEUE_END=${QUEUE_END:-"2026-08-18 13:20"}  # chip must be free for the driver bench (session ends ~14:07)
END_S=$(date -u -d "$QUEUE_END" +%s)
left() { echo $(( END_S - $(date -u +%s) )); }

STALL=${STALL:-420}
GRACE=${GRACE:-90}
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }

# wd <hard_timeout_s> <log> <cmd...>: run cmd, kill on stall/timeout/deadline.
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
      echo "WD: stalled ${STALL}s (cpu=$cpu sz=$sz el=${el}s), killing $pid"
      kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      return 125
    fi
  done
  wait "$pid"; return $?
}

done_rec() { [ -s "$1" ] && { echo "=== skip (have $1)"; return 0; } || return 1; }

# ---- 0. 8-body guidance sweep + winner confirm (1D: fix-independent,  ----
# ----    bounded, highest certainty-per-hour — run before the long 2D) ----
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

# ---- 1. regenerate the 1024-sim dataset on the corrected solver ----
if [ ! -f dataset/airfoil_1024_v2/fields.npy ]; then
  wd 5400 /tmp/r3_genv2.log python scripts_paper/gen_airfoil_v2.py
  status gen_v2 $?
fi
[ -f dataset/airfoil_1024_v2/fields.npy ] || { echo "FATAL: no v2 dataset"; exit 1; }

# ---- 2. ForceUnet on the v2 data ----
if [ ! -f results/force_v2/.done ]; then
  wd 1800 /tmp/r3_force_v2.log \
    python -m cindm_tpu.cli.train_force \
      --is_testdata False --n_sims 1024 --data_cache dataset/airfoil_1024_v2 \
      --train_num_steps 8000 --results_folder ./results/force_v2
  rc=$?; status force_v2 $rc
  [ "$rc" -eq 0 ] && touch results/force_v2/.done
fi

# ---- 3. long 2D train on v2 (resume loop survives tunnel wedges) ----
# Leave DESIGN_RESERVE seconds for phases 4-8.
DESIGN_RESERVE=${DESIGN_RESERVE:-13500}
if [ ! -f results/airfoil_v2/.done ]; then
  while :; do
    budget=$(( $(left) - DESIGN_RESERVE ))
    [ "$budget" -le 300 ] && { echo "=== train2d budget exhausted"; break; }
    wd "$budget" /tmp/r3_train2d_v2.log \
      python -m cindm_tpu.cli.train_2d \
        --cond_frames 2 --pred_frames 4 --ts 4 --batch_size 48 \
        --train_num_steps ${TRAIN_STEPS:-200000} --is_testdata False \
        --n_sims 1024 --data_cache dataset/airfoil_1024_v2 \
        --device_data True --remat True --steps_per_launch 25 \
        --save_and_sample_every 5000 \
        --results_folder ./results/airfoil_v2 --resume True
    rc=$?; status train2d_v2 $rc
    [ "$rc" -eq 0 ] && { touch results/airfoil_v2/.done; break; }
    [ "$rc" -eq 99 ] && break
    sleep 10   # wedge kill -> resume from the last 5k milestone
  done
fi

# ---- 4. multi-boundary designs on the v2 prior ----
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
d2 nb2_sym 2 --lambda_separation 10 --init_sep 0.5
d2 nb2 2
d2 nb3_sym 3 --lambda_separation 10 --init_sep 0.5

# ---- 5. paper-protocol CinDM tables (batch 500; per-row flush) ----
if ! done_rec results/tables_paper.json; then
  wd 3600 /tmp/r3_tables.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --flagship_batch 128 --skip_baselines \
      --diffusion_path ./results/nbody2_coll --milestone 210000 \
      --flagship_winner ./results/designs/8body_T54_winner_b64.json \
      --out ./results/tables_paper.json
  status tables_cindm $?
fi

# ---- 6. FNO surrogate on v2 + 2-boundary 2D baselines ----
if [ ! -f results/fno_v2/.done ]; then
  wd 2400 /tmp/r3_fno_v2.log \
    python -m cindm_tpu.cli.train_baseline \
      --algo fno --is_unittest False --is_testdata False --n_sims 1024 \
      --data_cache dataset/airfoil_1024_v2 --epochs 10 --steps_per_epoch 500 \
      --batch_size 16 --results_folder ./results/fno_v2
  rc=$?; status fno_v2 $rc
  [ "$rc" -eq 0 ] && touch results/fno_v2/.done
fi
for M in GD CEM; do
  done_rec results/designs/r3v2_baseline2d_"$M"_nb2.json && continue
  wd 1800 /tmp/r3_2dbase_"$M".log \
    python -m cindm_tpu.cli.design_2d_baseline \
      --design_method "$M" --surrogate fno --num_boundaries 2 \
      --surrogate_path ./results/fno_v2 --force_model_path ./results/force_v2 \
      --data_dir dataset/b2dinit_v2 --n_sims 16 --batch_size 8 \
      --optim_iter 100 --lr 1e-4
  status "2dbase_$M" $?
  rec /tmp/r3_2dbase_"$M".log results/designs/r3v2_baseline2d_"$M"_nb2.json
done

# ---- 6b. multibody EBM-compose analysis (VERDICT r2 #9; ~25 min) ----
if ! done_rec results/designs/analysis_multibody.json; then
  wd 2700 /tmp/r3_multibody.log bash scripts_paper/multibody_analysis.sh
  status multibody_analysis $?
fi

# ---- 7. roofline attribution ----
[ -f /tmp/r3_roofline.done ] || {
  wd 1500 /tmp/r3_roofline.log python benchmarks/bench_roofline.py
  rc=$?; status roofline $rc; [ "$rc" -eq 0 ] && touch /tmp/r3_roofline.done; }

# ---- 8. baseline paper tables (reference budgets) ----
if ! done_rec results/tables_paper_baselines.json; then
  wd 3600 /tmp/r3_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  status tables_baselines $?
fi

echo DAY_QUEUE_DONE
