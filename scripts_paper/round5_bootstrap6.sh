#!/bin/bash
# Round-5 chip queue. Start this FIRST, before any CPU work (the round-2/3/4
# lesson: staging chip work behind CPU work is how measured numbers die).
#
# Encodes the round-4 diagnoses:
#   A. 1D baseline surrogates (lost in the round-3 VM wipe, retrain capped)
#   B. baseline paper tables (CEM N=1000/Ne=100 x 1000 iters, backprop 1000
#      steps) — the only Table-1 column never recorded at reference budgets
#   C. 2D v3 WIDE-BAND chain (y_band 0.2..0.8): the nb=3 region-partition
#      failure is dataset position diversity (RESULTS.md round-4) — dataset
#      -> ForceUnet -> 100k prior -> nb 1/2/3 region designs
#   D. 1D prior 200k -> 400k: guidance coefficients are saturated
#      (sweep8_ext.json); prior quality is the open flagship lever
#   E. leftovers from round 4 if their markers are absent (FNO v2 + 2D
#      GD/CEM nb=2 baselines)
#   F. flagship paper-table row re-run on the 400k prior
#
# Serialized: ONE TPU process at a time (axon tunnel). Idempotent markers.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export CINDM_REQUIRE_TPU=1
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}

# Window: default 10.5h from launch; override with QUEUE_END="YYYY-mm-dd HH:MM".
if [ -n "${QUEUE_END:-}" ]; then END_S=$(date -u -d "$QUEUE_END" +%s)
else END_S=$(( $(date -u +%s) + ${WINDOW_S:-37800} )); fi
left() { echo $(( END_S - $(date -u +%s) )); }

STALL=${STALL:-420}
GRACE=${GRACE:-90}
LOGSTALL=${LOGSTALL:-900}  # tunnel-wedge detector: kill on log silence
                           # (healthy remote compiles log within ~10 min;
                           # wedged clients creep CPU forever, log nothing)
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S) left=$(left)s"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }

wd() {  # wd <hard_timeout_s> <log> <cmd...>
  local hard=$1 log=$2; shift 2
  local l; l=$(left)
  [ "$l" -le 120 ] && { echo "WD: past QUEUE_END, skipping: $*"; return 99; }
  # cooperative pause: touch /tmp/q_pause to hold the queue BETWEEN jobs
  while [ -f /tmp/q_pause ]; do sleep 20; done
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
    if [ "$sz" != "$last_sz" ]; then
      last_logprog=$SECONDS
    elif [ "$el" -gt "$GRACE" ] && [ $((SECONDS - ${last_logprog:-$t0})) -ge "$LOGSTALL" ]; then
      echo "WD: log silent ${LOGSTALL}s (wedged tunnel?), killing $pid"
      kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null; wait "$pid" 2>/dev/null
      return 126
    fi
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


# ---- K. fused-RTB megakernel bench (round-4 roofline follow-up, ~10 min) ----
if [ ! -s results/fused_rtb_bench.json ]; then
  wd 1500 /tmp/r5_rtb_bench.log \
    python benchmarks/bench_fused_rtb.py --out ./results/fused_rtb_bench.json
  status rtb_bench $?
fi

# ---- A. 1D baseline surrogates (resume-capable, capped budgets) ----
tr1d() {  # tr1d <folder> <method> <steps>
  local folder=$1 method=$2 steps=$3
  local try
  for try in 1 2; do
    [ -d "results/$folder" ] && ls "results/$folder" | grep -qE '^[0-9]+$' && {
      echo "=== skip $folder (checkpointed)"; return 0; }
    wd 2100 "/tmp/r5_base_$folder.log" \
      python -m cindm_tpu.cli.train_1d --method_type "$method" \
        --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
        --train_num_steps "$steps" --save_and_sample_every 5000 \
        --steps_per_launch 25 --gradient_accumulate_every 1 --log_every 500 \
        --results_folder "./results/$folder" --resume True
    local rc=$?; status "$folder-try$try" $rc
    [ "$rc" -eq 0 ] && return 0
    [ "$rc" -eq 99 ] && return 99
    sleep 10
  done
}
tr1d nbody-2-forward forward_model 20000
tr1d nbody-2-rollout-one Unet_rollout_one 20000
tr1d nbody-2-gns-cond-one GNS_cond_one 10000
tr1d nbody-2-gns-direct GNS_direct 10000

# ---- B. baseline paper tables (reference design budgets) ----
if [ ! -f results/designs/.tablesbase_r5 ]; then
  wd 7200 /tmp/r5_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  rc=$?; status tables_baselines $rc
  [ "$rc" -eq 0 ] && touch results/designs/.tablesbase_r5
fi

# ---- C1. wide-band 2D dataset + ForceUnet (v3) ----
if [ ! -f results/force_v3/.done ]; then
  wd 9000 /tmp/r5_force_v3.log \
    python -m cindm_tpu.cli.train_force \
      --is_testdata False --n_sims 1024 --y_band 0.2 0.8 \
      --data_cache dataset/airfoil_1024_v3 \
      --train_num_steps 8000 --batch_size 32 \
      --results_folder ./results/force_v3
  rc=$?; status force_v3 $rc
  [ "$rc" -eq 0 ] && touch results/force_v3/.done
fi

# ---- C2. 2D diffusion prior on v3 (resume loop, budget-capped) ----
DESIGN_RESERVE=${DESIGN_RESERVE:-9000}
latest2d() { ls results/airfoil_v3 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }
if [ -f results/force_v3/.done ] && [ ! -f results/airfoil_v3/.done ]; then
  while :; do
    budget=$(( $(left) - DESIGN_RESERVE ))
    [ "$budget" -le 300 ] && { echo "=== train2d_v3 budget exhausted"; break; }
    wd "$budget" /tmp/r5_train2d.log \
      python -m cindm_tpu.cli.train_2d \
        --cond_frames 2 --pred_frames 4 --ts 4 --batch_size 48 \
        --train_num_steps 100000 --is_testdata False \
        --n_sims 1024 --y_band 0.2 0.8 --data_cache dataset/airfoil_1024_v3 \
        --device_data True --remat True --steps_per_launch 25 \
        --save_and_sample_every 5000 \
        --results_folder ./results/airfoil_v3 --resume True
    rc=$?; status train2d_v3 $rc
    [ "$rc" -eq 0 ] && { touch results/airfoil_v3/.done; break; }
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
fi

# ---- C3. region-partition designs on the wide-band prior ----
d2() {  # name nb extra...
  local name=$1 nb=$2; shift 2
  done_rec "results/designs/r5v3_${name}.json" && return 0
  wd 2100 /tmp/r5_design_"$name".log \
    python -m cindm_tpu.cli.design_2d \
      --model_path ./results/airfoil_v3 --force_model_path ./results/force_v3 \
      --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
      --coeff_ratio 2e-4 --evaluate True "$@"
  status "design_$name" $?
  rec /tmp/r5_design_"$name".log results/designs/r5v3_"$name".json
}
M3=$(latest2d)
if [ -f results/force_v3/.done ] && [ -n "${M3:-}" ] && [ "${M3:-0}" -ge 30000 ]; then
  d2 nb1 1
  d2 nb2_region 2 --region_partition y --region_band 0.2 0.8
  d2 nb3_region 3 --region_partition y --region_band 0.2 0.8
fi

# ---- P. persist v3 prior + ForceUnet (EMA-only bf16, one snapshot/model) ----
M3=$(latest2d)
if [ -n "${M3:-}" ] && [ ! -f "results/airfoil_v3/persisted_m${M3}.npz" ]; then
  python benchmarks/persist_ckpt.py --results_folder ./results/airfoil_v3 \
    --model unet2d --milestone "$M3" --ema_only True --dtype bfloat16 \
  && python benchmarks/persist_ckpt.py --results_folder ./results/force_v3 \
    --model force --ema_only True --dtype bfloat16 \
  && {
    git add -f "results/airfoil_v3/persisted_m${M3}.npz" results/force_v3/persisted_m*.npz
    git commit -q -m "Persist wide-band 2D prior (step ${M3}) + ForceUnet v3"
  }
  status persist_v3 $?
fi

# ---- E. round-4 leftovers (markers shared with round4_queue2.sh) ----
if [ -f dataset/airfoil_1024_v2/fields.npy ] && [ ! -f results/fno_v2/.done ]; then
  wd 2700 /tmp/r5_fno_v2.log \
    python -m cindm_tpu.cli.train_baseline \
      --algo fno --is_unittest False --is_testdata False --n_sims 1024 \
      --data_cache dataset/airfoil_1024_v2 --epochs 10 --steps_per_epoch 500 \
      --batch_size 16 --results_folder ./results/fno_v2
  rc=$?; status fno_v2 $rc
  [ "$rc" -eq 0 ] && touch results/fno_v2/.done
fi
if [ -f results/fno_v2/.done ] && [ -f results/force_v2/.done ]; then
  for MTH in GD CEM; do
    done_rec results/designs/r4v2_baseline2d_"$MTH"_nb2.json && continue
    wd 2100 /tmp/r5_2dbase_"$MTH".log \
      python -m cindm_tpu.cli.design_2d_baseline \
        --design_method "$MTH" --surrogate fno --num_boundaries 2 \
        --surrogate_path ./results/fno_v2 --force_model_path ./results/force_v2 \
        --data_dir dataset/b2dinit_v2 --n_sims 16 --batch_size 8 \
        --optim_iter 100 --lr 1e-4
    status "2dbase_$MTH" $?
    rec /tmp/r5_2dbase_"$MTH".log results/designs/r4v2_baseline2d_"$MTH"_nb2.json
  done
fi

# ---- D'. elastic 1D-prior extension with whatever window remains ----
# (round-3 evidence says training budget is a weak flagship lever; this
# runs LAST and only eats time nothing else wanted, keeping a 45-min
# driver-bench reserve)
if :; then
  while :; do
    budget=$(( $(left) - 2700 ))
    [ "$budget" -le 600 ] && { echo "=== train1d-ext: no window left"; break; }
    wd "$budget" /tmp/r5_train1d.log \
      python -m cindm_tpu.cli.train_1d \
        --dataset nbody-2 --conditioned_steps 0 --rollout_steps 24 \
        --batch_size 512 --gradient_accumulate_every 1 --Unet_dim 64 \
        --n_sims 6000 --test_sims 100 --collision_frac 0.3 \
        --train_num_steps 400000 --save_and_sample_every 5000 \
        --steps_per_launch 25 --log_every 1000 \
        --results_folder ./results/nbody2_coll --resume True
    rc=$?; status train1d_ext $rc
    [ "$rc" -eq 0 ] || [ "$rc" -eq 99 ] && break
    sleep 10
  done
  M1=$(ls results/nbody2_coll | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "${M1:-}" ] && [ "${M1:-0}" -gt 200000 ]; then
    python benchmarks/persist_ckpt.py --results_folder ./results/nbody2_coll \
      --milestone "$M1" --ema_only True --dtype bfloat16 \
    && { git rm -q --cached results/nbody2_coll/persisted_m200000.npz 2>/dev/null
         git add -f "results/nbody2_coll/persisted_m${M1}.npz"
         git commit -q -m "Persist 1D collision prior at step ${M1} (EMA-only bf16)"; }
  fi
fi

echo R5_BOOTSTRAP_DONE @ $(date -u +%H:%M:%S)
