#!/bin/bash
# Round-4 chip queue, revision 2. Replaces round4_queue.sh after two course
# corrections discovered mid-round:
#   (1) QUEUE_END: the round started ~04:28 UTC (PROGRESS.jsonl wall_s is
#       cumulative; round-3 verdict committed 04:28), so the chip deadline
#       is ~15:45, not 18:15 — the first queue's window would have starved
#       every late step AND contended with the driver bench.
#   (2) Order: the cheap never-recorded steps (multibody analysis, roofline)
#       run BEFORE the expensive sweep/tables so a long overrun can't wipe
#       them out again; the sweep itself is now the folded one-compile-per-
#       recurrence run (benchmarks/run_sweep8.py).
# Serialized: ONE TPU process at a time (axon tunnel). Each step runs under
# `wd` (stall watchdog) and is idempotent via markers.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export JAX_LOG_COMPILES=1
export CINDM_REQUIRE_TPU=1
# keep the axon plugin path or the TPU backend fails to register (verify SKILL.md)
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}

QUEUE_END=${QUEUE_END:-"2026-08-19 15:45"}   # leave chip free for driver bench
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
latest2d() { ls results/airfoil_v2 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# ---- E. 2D diffusion prior on v2 (resume loop, budget-capped) ----
DESIGN_RESERVE=${DESIGN_RESERVE:-16200}
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
  # station inpainting (round-4 fix): proto-mask blobs held for t>=700 break
  # the deterministic collapse that made every non-station nb>=2 run 0-valid
  d2 nb2_station 2 --station_until 700
  d2 nb3_station 3 --station_until 700
  # revision 2: Y-staggered stations INSIDE the training position band
  # (x-stations at W/3, 2W/3 sit outside x∈[0.25,0.45]W — the mask migrates
  # back after release and merges) + longer hold (release at t=300)
  d2 nb2_stationY 2 --station_until 300 --dump_raw ./results/designs/raw_nb2_stationY.npy
  d2 nb3_stationY 3 --station_until 300
  # revision 3: region partition — each boundary's mask zero-inpainted
  # outside its own horizontal band every step (non-overlap by
  # construction, design free inside the band)
  d2 nb2_region 2 --region_partition y
  d2 nb3_region 3 --region_partition y
fi

# ---- P. persist the 2D prior + ForceUnet (EMA-only bf16) + commit ----
M2=$(latest2d)
if [ -n "$M2" ] && [ ! -f "results/airfoil_v2/persisted_m${M2}.npz" ]; then
  python benchmarks/persist_ckpt.py --results_folder ./results/airfoil_v2 \
    --model unet2d --milestone "$M2" --ema_only True --dtype bfloat16 \
  && python benchmarks/persist_ckpt.py --results_folder ./results/force_v2 \
    --model force --ema_only True --dtype bfloat16 \
  && {
    git add -f "results/airfoil_v2/persisted_m${M2}.npz" results/force_v2/persisted_m*.npz
    git commit -q -m "Persist 2D prior (step ${M2}) + ForceUnet (EMA-only bf16 snapshots)"
  }
  status persist2d $?
fi

# ---- M. multibody EBM-compose analysis (uncond prior + 4/8-body records) ----
if [ ! -s results/designs/analysis_multibody8.json ]; then
  wd 4200 /tmp/r4_multibody.log bash scripts_paper/multibody_analysis.sh
  status multibody $?
fi

# ---- K. roofline attribution ----
if [ ! -f results/roofline.json ]; then
  wd 2100 /tmp/r4_roofline.log python benchmarks/bench_roofline.py
  status roofline $?
fi

# ---- G. 8-body sweep: folded grid (one compile per recurrence value) ----
cp -n results/designs/sweep8.json results/designs/sweep8_r3.json 2>/dev/null
if [ ! -f results/designs/.sweep8_r4 ]; then
  wd 4800 /tmp/r4_sweep8.log \
    python benchmarks/run_sweep8.py \
      --model_path ./results/nbody2_coll --batch_size 32 \
      --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 \
      --recurrences 10 20 \
      --out ./results/designs/sweep8.json
  rc=$?; status sweep8 $rc
  [ "$rc" -eq 0 ] && touch results/designs/.sweep8_r4
fi
if [ ! -f results/designs/.sweep8norm_r4 ]; then
  wd 2400 /tmp/r4_sweep8norm.log \
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
# run_tables_paper.py resumes from --out (completed rows are skipped), so
# the guard is a completion marker, not file existence
if [ ! -f results/designs/.tables_r4 ]; then
  wd 7200 /tmp/r4_tables.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --flagship_batch 128 --skip_baselines \
      --diffusion_path ./results/nbody2_coll \
      --flagship_winner ./results/designs/8body_T54_winner_b64.json \
      --out ./results/tables_paper.json
  rc=$?; status tables_cindm $rc
  [ "$rc" -eq 0 ] && touch results/designs/.tables_r4
fi

# ---- G2. extension grid toward the observed trend (higher coefs, more
# recurrence — the 12-point grid's best corner was 0.4/0.6/rec20) ----
if [ ! -f results/designs/.sweep8ext_r4 ]; then
  wd 3000 /tmp/r4_sweep8ext.log \
    python benchmarks/run_sweep8.py \
      --model_path ./results/nbody2_coll --batch_size 32 \
      --design_coefs 0.4 0.8 --consistency_coefs 0.6 1.2 \
      --recurrences 20 30 \
      --out ./results/designs/sweep8_ext.json
  rc=$?; status sweep8ext $rc
  # a better winner invalidates the batch-64 confirm -> rerun it
  [ "$rc" -eq 0 ] && { touch results/designs/.sweep8ext_r4
                       rm -f results/designs/8body_T54_winner_b64.json; }
fi
if [ ! -f results/designs/8body_T54_winner_b64.json ]; then
  wd 1800 /tmp/r4_sweep8_confirm2.log python benchmarks/confirm_sweep8.py
  status sweep8_confirm2 $?
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
if [ ! -f results/designs/.tablesbase_r4 ]; then
  wd 5400 /tmp/r4_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  rc=$?; status tables_baselines $rc
  [ "$rc" -eq 0 ] && touch results/designs/.tablesbase_r4
fi

echo R4_QUEUE2_DONE @ $(date -u +%H:%M:%S)
