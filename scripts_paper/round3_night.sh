#!/bin/bash
# Round-3 serialized TPU queue (single v5e chip — one process at a time).
#
# Phase 0 waits for the long 2D train (launched separately) to pass
# STEP_TARGET or DEADLINE, then stops it at a 10k-milestone boundary and
# runs, in VERDICT round-2 priority order:
#   1. ForceUnet retrain on the 1024-sim cache                (item 1)
#   2. design_2d nb=1/2/3 + symmetry-breaking ablations       (item 1)
#   3. 8-body guidance sweep + batch-64 winner confirmation   (item 2)
#   4. finite-Re cylinder anchor                              (item 3)
#   5. 2-boundary 2D baseline rows (GD + CEM over FNO)        (item 4)
#   6. roofline attribution                                   (weak 6/item 8)
#   7. paper-protocol Tables 1/2 (batch 500; flushes per row) (item 5)
# Every step is timeout-bounded; the caller bounds the whole queue so the
# chip is idle before the driver's end-of-round bench.
#
# Usage: round3_night.sh <trainer_pid_timeout> <trainer_pid_python>
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

TPID1=${1:-0}; TPID2=${2:-0}
STEP_TARGET=${STEP_TARGET:-121000}
DEADLINE=${DEADLINE:-$(date -d '23:00' +%s)}

status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" && cat "$2"; }

# ---- Phase 0: wait for the 2D trainer, then stop it past a milestone ----
step=0
while kill -0 "$TPID2" 2>/dev/null; do
  step=$(grep -ao 'step [0-9]*' /tmp/train2d_long.log | tail -1 | cut -d' ' -f2)
  now=$(date +%s)
  if [ "${step:-0}" -ge "$STEP_TARGET" ] || [ "$now" -ge "$DEADLINE" ]; then
    kill "$TPID1" "$TPID2" 2>/dev/null
    sleep 25
    kill -9 "$TPID2" 2>/dev/null
    break
  fi
  sleep 45
done
sleep 10
status "train2d stopped at step ${step:-?}" 0

# ---- 1. ForceUnet on the 1024-sim cache ----
timeout 1500 python -m cindm_tpu.cli.train_force \
  --is_testdata False --n_sims 1024 --data_cache dataset/airfoil_1024 \
  --train_num_steps 8000 --results_folder ./results/force_long \
  > /tmp/r3_force.log 2>&1
status force $?

# ---- 2. design_2d: nb=1 sanity, nb=2 default, nb=2/3 symmetry-breaking ----
d2() {  # name nb extra...
  local name=$1 nb=$2; shift 2
  timeout 1500 python -m cindm_tpu.cli.design_2d \
    --model_path ./results/airfoil_long --force_model_path ./results/force_long \
    --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
    --coeff_ratio 2e-4 --evaluate True "$@" \
    > /tmp/r3_design_"$name".log 2>&1
  status "design_$name" $?
  rec /tmp/r3_design_"$name".log results/designs/r3_"$name".json
}
d2 nb1 1
d2 nb2 2
d2 nb2_sym 2 --lambda_separation 10 --init_sep 0.5
d2 nb3_sym 3 --lambda_separation 10 --init_sep 0.5

# ---- 3. 8-body guidance sweep (collision ckpt @210k) + winner confirm ----
timeout 2700 python benchmarks/run_sweep8.py \
  --model_path ./results/nbody2_coll --milestone 210000 --batch_size 32 \
  --design_coefs 0.1 0.2 0.4 --consistency_coefs 0.2 0.6 --recurrences 10 \
  --out ./results/designs/sweep8.json > /tmp/r3_sweep8.log 2>&1
status sweep8 $?
timeout 1500 python - > /tmp/r3_sweep8_confirm.log 2>&1 <<'EOF'
import json, sys
sys.path.insert(0, ".")
rows = json.load(open("results/designs/sweep8.json"))
best = min((r for r in rows if "design_obj" in r), key=lambda r: r["design_obj"])
print("WINNER", json.dumps(best))
from cindm_tpu.cli import design_1d
rec = design_1d.main([
    "--model_path", "./results/nbody2_coll", "--milestone", "210000",
    "--compose_n_bodies", "8", "--n_composed", "2",
    "--batch_size", "64", "--sample_steps", "1000",
    "--design_guidance", f"standard-recurrence-{best['recurrence']}",
    "--design_coef", str(best["design_coef"]),
    "--consistency_coef", str(best["consistency_coef"]),
    "--host_chunks", "20",
])
rec.update({"design_coef": best["design_coef"],
            "consistency_coef": best["consistency_coef"],
            "recurrence": best["recurrence"], "milestone": 210000})
with open("results/designs/8body_T54_winner_b64.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))
EOF
status sweep8_confirm $?

# ---- 4. finite-Re cylinder anchor ----
timeout 1800 python benchmarks/bench_bdim_re_anchor.py \
  > /tmp/r3_re_anchor.log 2>&1
status re_anchor $?

# ---- 5. 2-boundary 2D baseline rows (GD + CEM over FNO) ----
for M in GD CEM; do
  timeout 1200 python -m cindm_tpu.cli.design_2d_baseline \
    --design_method "$M" --surrogate fno --num_boundaries 2 \
    --surrogate_path ./results/fno_384 --force_model_path ./results/force_long \
    --optim_iter 100 --lr 1e-4 > /tmp/r3_2dbase_"$M".log 2>&1
  status "2dbase_$M" $?
  rec /tmp/r3_2dbase_"$M".log results/designs/r3_baseline2d_"$M"_nb2.json
done

# ---- 6. roofline attribution ----
timeout 1200 python benchmarks/bench_roofline.py > /tmp/r3_roofline.log 2>&1
status roofline $?

# ---- 7. paper-protocol tables (flushes per row; whatever lands, lands) ----
timeout 5400 python benchmarks/run_tables_paper.py \
  --batch_size 500 --flagship_batch 128 --skip_baselines \
  --out ./results/tables_paper.json > /tmp/r3_tables.log 2>&1
status tables_cindm $?
timeout 3600 python benchmarks/run_tables_paper.py \
  --batch_size 500 --only_bodies 0 \
  --out ./results/tables_paper_baselines.json > /tmp/r3_tables_base.log 2>&1
status tables_baselines $?

echo QUEUE_ALL_DONE
