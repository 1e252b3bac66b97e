#!/bin/bash
# Round-3d end-game (post-artifact-loss session, ~20 min of chip left):
#   0. stop the fresh collision-enriched trainer at its latest 5k milestone
#   1. snapshot that milestone to a git-committable persisted_m*.npz
#   2. 8-body guidance sweep, 4 points at batch 32 (VERDICT r2 #2)
#   3. paper-protocol 2-body direct row at batch 500 (VERDICT r2 #5 seed)
#   4. confirm the sweep winner at batch 64 (flagship Table-2 row)
# Every step timeout-bounded and idempotent; chip is free when this exits.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
done_rec() { [ -s "$1" ] && { echo "=== skip (have $1)"; return 0; } || return 1; }

# ---- 0. stop the trainer cleanly ----
if [ -f /tmp/r3c_train1d.pid ]; then
  touch /tmp/r3c_stop
  pid=$(cat /tmp/r3c_train1d.pid)
  kill "$pid" 2>/dev/null; sleep 15; kill -9 "$pid" 2>/dev/null; sleep 5
fi
MILESTONE=$(ls results/nbody2_coll 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$MILESTONE" ] || { echo "FATAL: no milestone in results/nbody2_coll"; exit 1; }
echo "=== using milestone $MILESTONE"

# ---- 1. persist the checkpoint (CPU-only process) so it survives the ----
# ---- VM wipe; runs concurrently with the TPU sweep below             ----
if [ ! -f "results/nbody2_coll/persisted_m${MILESTONE}.npz" ]; then
  timeout 600 nice -n 10 python benchmarks/persist_ckpt.py \
    --results_folder ./results/nbody2_coll --milestone "$MILESTONE" \
    > /tmp/r3d_persist.log 2>&1 &
  PERSIST_PID=$!
fi

# ---- 2. 8-body guidance sweep (batch 32, recurrence 10: one compile) ----
if ! done_rec results/designs/sweep8.json; then
  timeout 900 python benchmarks/run_sweep8.py \
    --model_path ./results/nbody2_coll --batch_size 32 \
    --design_coefs 0.2 0.4 --consistency_coefs 0.2 0.6 --recurrences 10 \
    --out ./results/designs/sweep8.json > /tmp/r3_sweep8.log 2>&1
  status sweep8 $?
fi

# ---- 3. 2-body direct at the paper protocol (batch 500) ----
if ! done_rec results/tables_paper.json; then
  timeout 600 python benchmarks/run_tables_paper.py \
    --diffusion_path ./results/nbody2_coll --batch_size 500 \
    --only_bodies 2 --only_composed 0 2 --skip_baselines \
    --out ./results/tables_paper.json > /tmp/r3_tables.log 2>&1
  status tables_2body $?
fi

# ---- 4. confirm sweep winner at batch 64 (the flagship row) ----
if [ -s results/designs/sweep8.json ] && \
   ! done_rec results/designs/8body_T54_winner_b64.json; then
  timeout 700 python benchmarks/confirm_sweep8.py \
    --model_path ./results/nbody2_coll > /tmp/r3_sweep8_confirm.log 2>&1
  status sweep8_confirm $?
fi

[ -n "${PERSIST_PID:-}" ] && { wait "$PERSIST_PID"; status persist $?; }
echo R3D_DONE @ $(date -u +%H:%M:%S)
