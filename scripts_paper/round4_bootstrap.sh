#!/bin/bash
# Round-4 bootstrap: the repo now carries trained weights in git
# (results/nbody2_coll/persisted_m*.npz, added with `git add -f`), so a fresh
# VM starts from a real model instead of from scratch. Run this FIRST thing
# in round 4; it is idempotent and ordered by VERDICT round-2 priority:
#
#   A. resume 1D training npz -> 200k steps (closes the budget gap;
#      CheckpointManager falls back to the committed npz transparently)
#   B. persist + commit the 200k checkpoint
#   C. 8-body sweep + winner + FULL paper tables (VERDICT #2, #5)
#   D. the 2D v2 chain (VERDICT #1): gen dataset -> ForceUnet -> 200k prior
#      -> nb 1/2/3 designs with symmetry-breaking ablations  (~4 h chip —
#      start it as early as chip budget allows; round3_day.sh has the exact
#      commands and the wd watchdog)
#   E. roofline (VERDICT #8), multibody analysis (VERDICT #9)
#
# Known infra hazards (see .claude/skills/verify/SKILL.md): the tunnel wedges
# on >1 h runs (log-staleness watchdog + --resume True), the relay can die at
# session handover (CINDM_REQUIRE_TPU=1 fails fast), one TPU process at a time.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export CINDM_REQUIRE_TPU=1

# ---- A. resume 1D training to 200k (wedge-relaunch loop) ----
if [ ! -f results/nbody2_coll/.done200k ]; then
  MAX_STEPS=200000 STALL=300 bash scripts_paper/round3c_train1d.sh
  M=$(ls results/nbody2_coll 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  [ "${M:-0}" -ge 200000 ] && touch results/nbody2_coll/.done200k
fi

# ---- B. persist + commit ----
M=$(ls results/nbody2_coll | grep -E '^[0-9]+$' | sort -n | tail -1)
if [ -n "$M" ] && [ ! -f "results/nbody2_coll/persisted_m${M}.npz" ]; then
  python benchmarks/persist_ckpt.py --results_folder ./results/nbody2_coll \
    --milestone "$M"
  git add -f "results/nbody2_coll/persisted_m${M}.npz"
  git commit -m "Persist 1D collision-enriched checkpoint at step ${M}"
fi

# ---- C. sweep + tables at the full grid/budgets ----
rm -f results/designs/sweep8.json  # re-sweep at the stronger prior
python benchmarks/run_sweep8.py --model_path ./results/nbody2_coll \
  --batch_size 32 --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 \
  --recurrences 10 --out ./results/designs/sweep8.json
python benchmarks/confirm_sweep8.py --model_path ./results/nbody2_coll
python benchmarks/run_tables_paper.py --diffusion_path ./results/nbody2_coll \
  --batch_size 500 --flagship_batch 128 --skip_baselines \
  --flagship_winner results/designs/8body_T54_winner_b64.json \
  --out ./results/tables_paper.json

# ---- D/E: follow round3_day.sh phases 1-8 (2D v2 chain, baselines, ----
# ----      roofline, multibody) — commands + watchdog live there.   ----
echo "BOOTSTRAP CORE DONE — continue with scripts_paper/round3_day.sh phases 1-8"
