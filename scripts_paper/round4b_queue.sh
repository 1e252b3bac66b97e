#!/bin/bash
# Round-4b chip queue (continuation session). Ordered by landed-evidence
# value per chip-minute, and EVERY result JSON / snapshot is committed the
# moment it exists — the round-3/4/5 lesson: the VM gets wiped between
# sessions and only git survives.
#
#   K.  fused-kernel bench JSONs (RESULTS.md round-5 section cites them;
#       they were never actually committed — regenerate + commit, ~25 min)
#   A.  1D baseline surrogates (lost in the wipe; restores reproducibility
#       of tables_paper_baselines)
#   B.  baseline paper tables (CEM N=1000/Ne=100 x 1000 iters, backprop
#       1000 steps) -> commit JSON
#   C.  2D v3 WIDE-BAND chain (y_band 0.2..0.8): nb=3 region-partition
#       failure is dataset position diversity (RESULTS.md round-4) —
#       dataset -> ForceUnet -> FNO -> GD/CEM nb=2 baselines -> 100k prior
#       -> nb 1/2/3 region designs, snapshots + JSONs committed as they land
#   D'. 1D prior 200k -> 400k with whatever window remains
#
# Serialized: ONE TPU process at a time (axon tunnel). Idempotent markers.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export CINDM_REQUIRE_TPU=1
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}

if [ -n "${QUEUE_END:-}" ]; then END_S=$(date -u -d "$QUEUE_END" +%s)
else END_S=$(( $(date -u +%s) + ${WINDOW_S:-36000} )); fi
left() { echo $(( END_S - $(date -u +%s) )); }

STALL=${STALL:-420}
GRACE=${GRACE:-90}
LOGSTALL=${LOGSTALL:-900}
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S) left=$(left)s"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }
commit_res() {  # commit_res <msg> <paths...>
  local msg=$1; shift
  local have=0 p
  for p in "$@"; do [ -s "$p" ] && { git add -f "$p"; have=1; }; done
  [ "$have" -eq 1 ] && git commit -q -m "$msg" && echo "=== committed: $msg"
}

wd() {  # wd <hard_timeout_s> <log> <cmd...>
  local hard=$1 log=$2; shift 2
  local l; l=$(left)
  [ "$l" -le 120 ] && { echo "WD: past QUEUE_END, skipping: $*"; return 99; }
  while [ -f /tmp/q_pause ]; do sleep 20; done
  [ "$hard" -gt "$l" ] && hard=$l
  "$@" > "$log" 2>&1 &
  local pid=$! t0=$SECONDS last_prog=$SECONDS last_cpu="" last_sz=-1
  local last_logprog=$SECONDS
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
    elif [ "$el" -gt "$GRACE" ] && [ $((SECONDS - last_logprog)) -ge "$LOGSTALL" ]; then
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

# ---- K. fused-kernel bench JSONs (cited by RESULTS.md, never committed) ----
if [ ! -s results/fused_rtb_bench.json ]; then
  wd 1800 /tmp/r4b_rtb_bench.log \
    python benchmarks/bench_fused_rtb.py --out ./results/fused_rtb_bench.json
  status rtb_bench $?
fi
if [ -s results/fused_rtb_bench.json ] && [ ! -s results/fused_model_bench.json ]; then
  wd 1800 /tmp/r4b_model_bench.log \
    python benchmarks/bench_fused_model.py --out ./results/fused_model_bench.json
  status model_bench $?
fi
commit_res "Fused-kernel bench JSONs committed (cited by RESULTS round-5 megakernel verdict)" \
  results/fused_rtb_bench.json results/fused_model_bench.json

# ---- A. 1D baseline surrogates (resume-capable, capped budgets) ----
tr1d() {  # tr1d <folder> <method> <steps>
  local folder=$1 method=$2 steps=$3
  local try
  for try in 1 2; do
    [ -d "results/$folder" ] && ls "results/$folder" | grep -qE '^[0-9]+$' && {
      echo "=== skip $folder (checkpointed)"; return 0; }
    wd 2100 "/tmp/r4b_base_$folder.log" \
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
if [ ! -s results/tables_paper_baselines.json ]; then
  wd 7200 /tmp/r4b_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  status tables_baselines $?
fi
commit_res "Baseline paper tables JSON (reference CEM/backprop budgets) re-landed and committed" \
  results/tables_paper_baselines.json

# ---- C1. wide-band 2D dataset + ForceUnet (v3) ----
if [ ! -f results/force_v3/.done ]; then
  wd 9000 /tmp/r4b_force_v3.log \
    python -m cindm_tpu.cli.train_force \
      --is_testdata False --n_sims 1024 --y_band 0.2 0.8 \
      --data_cache dataset/airfoil_1024_v3 \
      --train_num_steps 8000 --batch_size 32 \
      --results_folder ./results/force_v3
  rc=$?; status force_v3 $rc
  [ "$rc" -eq 0 ] && touch results/force_v3/.done
fi
if [ -f results/force_v3/.done ] && \
   ! git ls-files results/force_v3 | grep -q persisted; then
  python benchmarks/persist_ckpt.py --results_folder ./results/force_v3 \
    --model force --ema_only True --dtype bfloat16 \
  && commit_res "Persist ForceUnet v3 (wide-band, EMA-only bf16)" \
       results/force_v3/persisted_m*.npz
fi

# ---- C1b. FNO on v3 + GD/CEM nb=2 baseline rows ----
if [ -f dataset/airfoil_1024_v3/fields.npy ] && [ ! -f results/fno_v3/.done ]; then
  wd 2700 /tmp/r4b_fno_v3.log \
    python -m cindm_tpu.cli.train_baseline \
      --algo fno --is_unittest False --is_testdata False --n_sims 1024 \
      --data_cache dataset/airfoil_1024_v3 --epochs 10 --steps_per_epoch 500 \
      --batch_size 16 --results_folder ./results/fno_v3
  rc=$?; status fno_v3 $rc
  [ "$rc" -eq 0 ] && touch results/fno_v3/.done
fi
if [ -f results/fno_v3/.done ] && [ -f results/force_v3/.done ]; then
  for MTH in GD CEM; do
    done_rec results/designs/r4b_baseline2d_"$MTH"_nb2.json && continue
    wd 2700 /tmp/r4b_2dbase_"$MTH".log \
      python -m cindm_tpu.cli.design_2d_baseline \
        --design_method "$MTH" --surrogate fno --num_boundaries 2 \
        --surrogate_path ./results/fno_v3 --force_model_path ./results/force_v3 \
        --data_dir dataset/b2dinit_v3 --n_sims 16 --batch_size 8 \
        --optim_iter 100 --lr 1e-4
    status "2dbase_$MTH" $?
    rec /tmp/r4b_2dbase_"$MTH".log results/designs/r4b_baseline2d_"$MTH"_nb2.json
  done
  commit_res "2D nb=2 GD/CEM baseline rows on the v3 wide-band data" \
    results/designs/r4b_baseline2d_GD_nb2.json \
    results/designs/r4b_baseline2d_CEM_nb2.json
fi

# ---- C2. 2D diffusion prior on v3 (resume loop, budget-capped) ----
DESIGN_RESERVE=${DESIGN_RESERVE:-9000}
latest2d() { ls results/airfoil_v3 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }
if [ -f results/force_v3/.done ] && [ ! -f results/airfoil_v3/.done ]; then
  while :; do
    budget=$(( $(left) - DESIGN_RESERVE ))
    [ "$budget" -le 300 ] && { echo "=== train2d_v3 budget exhausted"; break; }
    wd "$budget" /tmp/r4b_train2d.log \
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
    # persist an intermediate snapshot every loop so a wipe can't zero the run
    M=$(latest2d)
    if [ -n "${M:-}" ] && [ ! -f "results/airfoil_v3/persisted_m${M}.npz" ]; then
      python benchmarks/persist_ckpt.py --results_folder ./results/airfoil_v3 \
        --model unet2d --milestone "$M" --ema_only True --dtype bfloat16 \
      && { git rm -q --cached results/airfoil_v3/persisted_m*.npz 2>/dev/null
           commit_res "Persist wide-band 2D prior v3 (step ${M}, EMA-only bf16)" \
             "results/airfoil_v3/persisted_m${M}.npz"; }
    fi
  done
fi

# ---- C3. region-partition designs on the wide-band prior ----
d2() {  # name nb extra...
  local name=$1 nb=$2; shift 2
  done_rec "results/designs/r4b_v3_${name}.json" && return 0
  wd 2700 /tmp/r4b_design_"$name".log \
    python -m cindm_tpu.cli.design_2d \
      --model_path ./results/airfoil_v3 --force_model_path ./results/force_v3 \
      --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
      --coeff_ratio 2e-4 --evaluate True "$@"
  status "design_$name" $?
  rec /tmp/r4b_design_"$name".log results/designs/r4b_v3_"$name".json
}
M3=$(latest2d)
if [ -f results/force_v3/.done ] && [ -n "${M3:-}" ] && [ "${M3:-0}" -ge 30000 ]; then
  d2 nb1 1
  d2 nb2_region 2 --region_partition y --region_band 0.2 0.8
  d2 nb3_region 3 --region_partition y --region_band 0.2 0.8
  commit_res "v3 wide-band region-partition design records (nb 1/2/3)" \
    results/designs/r4b_v3_nb1.json \
    results/designs/r4b_v3_nb2_region.json \
    results/designs/r4b_v3_nb3_region.json
  # final persist at the milestone the designs ran on
  M3=$(latest2d)
  if [ -n "${M3:-}" ] && [ ! -f "results/airfoil_v3/persisted_m${M3}.npz" ]; then
    python benchmarks/persist_ckpt.py --results_folder ./results/airfoil_v3 \
      --model unet2d --milestone "$M3" --ema_only True --dtype bfloat16 \
    && { git rm -q --cached results/airfoil_v3/persisted_m*.npz 2>/dev/null
         commit_res "Persist wide-band 2D prior v3 (step ${M3}, EMA-only bf16)" \
           "results/airfoil_v3/persisted_m${M3}.npz"; }
  fi
fi

# ---- D'. elastic 1D-prior extension with whatever window remains ----
if :; then
  while :; do
    budget=$(( $(left) - 2700 ))
    [ "$budget" -le 600 ] && { echo "=== train1d-ext: no window left"; break; }
    wd "$budget" /tmp/r4b_train1d.log \
      python -m cindm_tpu.cli.train_1d \
        --dataset nbody-2 --conditioned_steps 0 --rollout_steps 24 \
        --batch_size 512 --gradient_accumulate_every 1 --Unet_dim 64 \
        --n_sims 6000 --test_sims 100 --collision_frac 0.3 \
        --train_num_steps 400000 --save_and_sample_every 5000 \
        --steps_per_launch 25 --log_every 1000 \
        --results_folder ./results/nbody2_coll --resume True
    rc=$?; status train1d_ext $rc
    { [ "$rc" -eq 0 ] || [ "$rc" -eq 99 ]; } && break
    sleep 10
  done
  M1=$(ls results/nbody2_coll 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "${M1:-}" ] && [ "${M1:-0}" -gt 200000 ]; then
    python benchmarks/persist_ckpt.py --results_folder ./results/nbody2_coll \
      --milestone "$M1" --ema_only True --dtype bfloat16 \
    && { git rm -q --cached results/nbody2_coll/persisted_m200000.npz 2>/dev/null
         commit_res "Persist 1D collision prior at step ${M1} (EMA-only bf16)" \
           "results/nbody2_coll/persisted_m${M1}.npz"; }
  fi
fi

echo R4B_QUEUE_DONE @ $(date -u +%H:%M:%S)
