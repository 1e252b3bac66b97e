#!/bin/bash
# Round-3 queue, part 3: wedge-resilient, idempotent tail.
#
# Every TPU step runs under `wd` — a watchdog that kills the step when it
# makes no progress (no CPU ticks AND no log growth) for STALL seconds;
# the axon tunnel occasionally hard-wedges a process mid-device-call
# (observed 3x tonight: 2D trainer twice, design_2d nb2 once — zero CPU,
# no log, forever). Killing the process recovers the chip; per-step
# timeouts alone burn their full budget on a wedge.
#
# Steps are skipped when their record file already exists and is non-empty,
# so this script can be (re)launched at any time after killing part 2.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export JAX_LOG_COMPILES=1   # compile-start lines count as log progress
export CINDM_REQUIRE_TPU=1  # fail instantly if the axon relay is down

# STALL must exceed the longest legitimate silent phase (a remote compile
# wait: zero host CPU, zero log; observed up to ~5-6 min) but cut wedges
# well below the 20-25 min step timeouts.
STALL=${STALL:-420}   # seconds of zero-progress before the kill
GRACE=${GRACE:-90}    # never kill before this many seconds (startup)
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && cat "$2"; }

cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }

# wd <hard_timeout_s> <log> <cmd...>: run cmd, kill on stall or timeout.
wd() {
  local hard=$1 log=$2; shift 2
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

d2() {  # name model force nb extra...
  local name=$1 model=$2 force=$3 nb=$4; shift 4
  done_rec "results/designs/r3_${name}.json" && return 0
  wd 1500 /tmp/r3_design_"$name".log \
    python -m cindm_tpu.cli.design_2d \
      --model_path "$model" --force_model_path "$force" \
      --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
      --coeff_ratio 2e-4 --evaluate True "$@"
  status "design_$name" $?
  rec /tmp/r3_design_"$name".log results/designs/r3_"$name".json
}

# ---- priority 1: multi-boundary designs on the round-3 prior ----
d2 nb2_sym ./results/airfoil_long ./results/force_long 2 --lambda_separation 10 --init_sep 0.5
d2 nb2     ./results/airfoil_long ./results/force_long 2
d2 nb3_sym ./results/airfoil_long ./results/force_long 3 --lambda_separation 10 --init_sep 0.5

# ---- priority 2: 8-body sweep + winner confirm ----
if ! done_rec results/designs/sweep8.json; then
  wd 2400 /tmp/r3_sweep8.log \
    python benchmarks/run_sweep8.py \
      --model_path ./results/nbody2_coll --milestone 210000 --batch_size 32 \
      --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 --recurrences 10 \
      --out ./results/designs/sweep8.json
  status sweep8 $?
fi
if ! done_rec results/designs/8body_T54_winner_b64.json; then
  wd 1200 /tmp/r3_sweep8_confirm.log python benchmarks/confirm_sweep8.py
  status sweep8_confirm $?
fi

# ---- priority 3: finite-Re cylinder anchor ----
if ! done_rec results/bdim_re_anchor.json; then
  wd 1500 /tmp/r3_re_anchor.log python benchmarks/bench_bdim_re_anchor.py
  status re_anchor $?
  python - <<'EOF'
import json
rows = []
for line in open("/tmp/r3_re_anchor.log", errors="replace"):
    line = line.strip()
    if line.startswith("{"):
        rows.append(json.loads(line))
if rows:
    json.dump(rows, open("results/bdim_re_anchor.json", "w"), indent=1)
print("anchor rows:", len(rows))
EOF
fi

# ---- priority 4: 2-boundary 2D baseline rows ----
for M in GD CEM; do
  done_rec results/designs/r3_baseline2d_"$M"_nb2.json && continue
  wd 1200 /tmp/r3_2dbase_"$M".log \
    python -m cindm_tpu.cli.design_2d_baseline \
      --design_method "$M" --surrogate fno --num_boundaries 2 \
      --surrogate_path ./results/fno_384 --force_model_path ./results/force_long \
      --optim_iter 100 --lr 1e-4
  status "2dbase_$M" $?
  rec /tmp/r3_2dbase_"$M".log results/designs/r3_baseline2d_"$M"_nb2.json
done

# ---- priority 5: paper-protocol CinDM tables (per-row flush) ----
if ! done_rec results/tables_paper.json; then
  wd 3600 /tmp/r3_tables.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --flagship_batch 128 --skip_baselines \
      --out ./results/tables_paper.json
  status tables_cindm $?
fi

# ---- priority 6: mechanism test on the round-2 prior ----
d2 nb2_sym_r2prior ./results/airfoil_paper ./results/force_paper 2 --lambda_separation 10 --init_sep 0.5

# ---- priority 7: roofline attribution ----
wd 1200 /tmp/r3_roofline.log python benchmarks/bench_roofline.py
status roofline $?

# ---- priority 8: baseline paper tables ----
if ! done_rec results/tables_paper_baselines.json; then
  wd 3600 /tmp/r3_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  status tables_baselines $?
fi

echo TAIL_ALL_DONE
