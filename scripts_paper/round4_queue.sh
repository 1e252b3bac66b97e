#!/bin/bash
# Round-4 chip queue. Ordered by VERDICT round-3 priority with the 2D v2
# chain's long pole (dataset gen) FIRST, then the cheap 1D resume that every
# 1D quality number keys off, then the rest of the 2D chain, then
# sweep/tables/baselines/roofline. Serialized: ONE TPU process at a time
# (axon tunnel). Each step runs under `wd` (stall watchdog — the tunnel
# hard-wedges processes mid-device-call) and is idempotent via markers, so
# the queue can be relaunched at any point.
#
# ADVICE round-3 fixes folded in: every chip-burning step is gated on its
# dependency's marker; the round-3 sweep record is snapshotted to
# sweep8_r3.json before being replaced; persist is EMA-only bf16.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export JAX_LOG_COMPILES=1
export CINDM_REQUIRE_TPU=1
# keep the axon plugin path or the TPU backend fails to register (verify SKILL.md)
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}

QUEUE_END=${QUEUE_END:-"2026-08-19 15:40"}   # leave chip free for driver bench
END_S=$(date -u -d "$QUEUE_END" +%s)
left() { echo $(( END_S - $(date -u +%s) )); }

STALL=${STALL:-420}
GRACE=${GRACE:-90}
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S) left=$(left)s"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }

wd() {  # wd <hard_timeout_s> <log> <cmd...>
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

# ---- A. regenerate the 1024-sim airfoil dataset on the corrected solver ----
if [ ! -f dataset/airfoil_1024_v2/fields.npy ]; then
  wd 7200 /tmp/r4_genv2.log python scripts_paper/gen_airfoil_v2.py
  status gen_v2 $?
fi
[ -f dataset/airfoil_1024_v2/fields.npy ] || echo "WARN: no v2 dataset — 2D chain will be skipped"

# ---- B. resume the 1D prior 45k -> 200k (wedge-relaunch loop) ----
latest1d() { ls results/nbody2_coll 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }
if [ ! -f results/nbody2_coll/.done200k ]; then
  B_BUDGET=$(( $(left) > 9000 ? 9000 : $(left) ))
  B_END=$(( SECONDS + B_BUDGET ))
  while [ "$(latest1d)" -lt 200000 ] && [ $SECONDS -lt $B_END ]; do
    wd $(( B_END - SECONDS )) /tmp/r4_train1d.log \
      python -m cindm_tpu.cli.train_1d \
        --dataset nbody-2 --conditioned_steps 0 --rollout_steps 24 \
        --batch_size 512 --gradient_accumulate_every 1 --Unet_dim 64 \
        --train_num_steps 200000 --save_and_sample_every 5000 \
        --n_sims 6000 --test_sims 100 --collision_frac 0.3 \
        --steps_per_launch 25 --log_every 100 \
        --results_folder ./results/nbody2_coll --resume True
    rc=$?; status train1d $rc
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
  [ "$(latest1d)" -ge 200000 ] && touch results/nbody2_coll/.done200k
fi

# ---- C. persist the strongest 1D milestone (EMA-only bf16) + commit ----
M=$(latest1d)
if [ -n "$M" ] && [ "$M" -gt 45000 ] && [ ! -f "results/nbody2_coll/persisted_m${M}.npz" ]; then
  python benchmarks/persist_ckpt.py --results_folder ./results/nbody2_coll \
    --milestone "$M" --ema_only True --dtype bfloat16 \
    && {
      git rm -q --cached results/nbody2_coll/persisted_m45000.npz 2>/dev/null
      rm -f results/nbody2_coll/persisted_m45000.npz
      git add -f "results/nbody2_coll/persisted_m${M}.npz"
      git commit -q -m "Persist 1D collision prior at step ${M} (EMA-only bf16 snapshot)"
    }
  status persist1d $?
fi

# ---- D. ForceUnet on the v2 data ----
if [ -f dataset/airfoil_1024_v2/fields.npy ] && [ ! -f results/force_v2/.done ]; then
  wd 2400 /tmp/r4_force_v2.log \
    python -m cindm_tpu.cli.train_force \
      --is_testdata False --n_sims 1024 --data_cache dataset/airfoil_1024_v2 \
      --train_num_steps 8000 --results_folder ./results/force_v2
  rc=$?; status force_v2 $rc
  [ "$rc" -eq 0 ] && touch results/force_v2/.done
fi

# ---- E. 2D diffusion prior on v2 (resume loop, budget-capped) ----
# RESERVE covers: designs (~1.5h) + sweep8 (~1h) + tables (~1.5h) +
# 2D baselines (~1h) + roofline (~0.5h).
DESIGN_RESERVE=${DESIGN_RESERVE:-17000}
TRAIN2D_STEPS=${TRAIN2D_STEPS:-100000}
if [ -f results/force_v2/.done ] && [ ! -f results/airfoil_v2/.done ]; then
  while :; do
    budget=$(( $(left) - DESIGN_RESERVE ))
    [ "$budget" -le 300 ] && { echo "=== train2d budget exhausted"; break; }
    wd "$budget" /tmp/r4_train2d.log \
      python -m cindm_tpu.cli.train_2d \
        --cond_frames 2 --pred_frames 4 --ts 4 --batch_size 48 \
        --train_num_steps "$TRAIN2D_STEPS" --is_testdata False \
        --n_sims 1024 --data_cache dataset/airfoil_1024_v2 \
        --device_data True --remat True --steps_per_launch 25 \
        --save_and_sample_every 5000 \
        --results_folder ./results/airfoil_v2 --resume True
    rc=$?; status train2d $rc
    [ "$rc" -eq 0 ] && { touch results/airfoil_v2/.done; break; }
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
fi
# any milestone >= 30k is usable for designs even if the full budget didn't land
latest2d() { ls results/airfoil_v2 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# ---- F. multi-boundary designs on the v2 prior ----
d2() {  # name nb extra...
  local name=$1 nb=$2; shift 2
  done_rec "results/designs/r4v2_${name}.json" && return 0
  wd 2100 /tmp/r4_design_"$name".log \
    python -m cindm_tpu.cli.design_2d \
      --model_path ./results/airfoil_v2 --force_model_path ./results/force_v2 \
      --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
      --coeff_ratio 2e-4 --evaluate True "$@"
  status "design_$name" $?
  rec /tmp/r4_design_"$name".log results/designs/r4v2_"$name".json
}
if [ -f results/force_v2/.done ] && [ "${M2:=$(latest2d)}" != "" ] && [ "${M2:-0}" -ge 30000 ]; then
  d2 nb1 1
  d2 nb2_sym 2 --lambda_separation 10 --init_sep 0.5
  d2 nb2 2
  d2 nb3_sym 3 --lambda_separation 10 --init_sep 0.5
fi

# ---- G. 8-body sweep (full grid + per-body-normalized ablation) ----
cp -n results/designs/sweep8.json results/designs/sweep8_r3.json 2>/dev/null
if [ ! -f results/designs/.sweep8_r4 ]; then
  wd 7200 /tmp/r4_sweep8.log \
    python benchmarks/run_sweep8.py \
      --model_path ./results/nbody2_coll --batch_size 32 \
      --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 \
      --recurrences 10 20 \
      --out ./results/designs/sweep8.json
  rc=$?; status sweep8 $rc
  [ "$rc" -eq 0 ] && touch results/designs/.sweep8_r4
fi
if [ ! -f results/designs/.sweep8norm_r4 ]; then
  wd 3600 /tmp/r4_sweep8norm.log \
    python benchmarks/run_sweep8.py \
      --model_path ./results/nbody2_coll --batch_size 32 \
      --design_coefs 0.2 0.4 0.8 --consistency_coefs 0.2 \
      --recurrences 10 --normalize_grad_per_body \
      --out ./results/designs/sweep8_norm.json
  rc=$?; status sweep8norm $rc
  [ "$rc" -eq 0 ] && touch results/designs/.sweep8norm_r4
fi
if [ ! -f results/designs/8body_T54_winner_b64.json ]; then
  wd 1800 /tmp/r4_sweep8_confirm.log python benchmarks/confirm_sweep8.py
  status sweep8_confirm $?
fi

# ---- H. paper-protocol CinDM tables (batch 500, reference budgets) ----
if ! done_rec results/tables_paper.json; then
  wd 7200 /tmp/r4_tables.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --flagship_batch 128 --skip_baselines \
      --diffusion_path ./results/nbody2_coll \
      --flagship_winner ./results/designs/8body_T54_winner_b64.json \
      --out ./results/tables_paper.json
  status tables_cindm $?
fi

# ---- I. FNO surrogate on v2 + 2-boundary 2D baselines ----
if [ -f dataset/airfoil_1024_v2/fields.npy ] && [ ! -f results/fno_v2/.done ]; then
  wd 2700 /tmp/r4_fno_v2.log \
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
    wd 2100 /tmp/r4_2dbase_"$MTH".log \
      python -m cindm_tpu.cli.design_2d_baseline \
        --design_method "$MTH" --surrogate fno --num_boundaries 2 \
        --surrogate_path ./results/fno_v2 --force_model_path ./results/force_v2 \
        --data_dir dataset/b2dinit_v2 --n_sims 16 --batch_size 8 \
        --optim_iter 100 --lr 1e-4
    status "2dbase_$MTH" $?
    rec /tmp/r4_2dbase_"$MTH".log results/designs/r4v2_baseline2d_"$MTH"_nb2.json
  done
fi

# ---- J. baseline paper tables (reference budgets) ----
if ! done_rec results/tables_paper_baselines.json; then
  wd 5400 /tmp/r4_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  status tables_baselines $?
fi

# ---- K. roofline attribution ----
if [ ! -f results/roofline.json ]; then
  wd 2100 /tmp/r4_roofline.log python benchmarks/bench_roofline.py
  rc=$?; status roofline $rc
fi

echo R4_QUEUE_DONE @ $(date -u +%H:%M:%S)
