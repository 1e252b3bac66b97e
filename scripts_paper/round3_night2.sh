#!/bin/bash
# Round-3 queue, part 2 (after the 2D trainer wedged at step 39k — tunnel
# hang, zero CPU; milestone 30000 is the round-3 prior). Waits for the
# in-flight ForceUnet retrain, then runs the design/sweep/anchor/baseline/
# roofline/tables sequence. See round3_night.sh for the full original plan.
# Usage: round3_night2.sh <force_train_pid>
set -u
cd /root/repo
export PYTHONUNBUFFERED=1

FPID=${1:-0}
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S)"; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" && cat "$2"; }

while kill -0 "$FPID" 2>/dev/null; do sleep 30; done
status "force train finished" 0

# ---- design_2d on the round-3 prior (airfoil_long @30k, 1024 sims) ----
d2() {  # name model force nb extra...
  local name=$1 model=$2 force=$3 nb=$4; shift 4
  timeout 1500 python -m cindm_tpu.cli.design_2d \
    --model_path "$model" --force_model_path "$force" \
    --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
    --coeff_ratio 2e-4 --evaluate True "$@" \
    > /tmp/r3_design_"$name".log 2>&1
  status "design_$name" $?
  rec /tmp/r3_design_"$name".log results/designs/r3_"$name".json
}
d2 nb1     ./results/airfoil_long ./results/force_long 1
d2 nb2     ./results/airfoil_long ./results/force_long 2
d2 nb2_sym ./results/airfoil_long ./results/force_long 2 --lambda_separation 10 --init_sep 0.5
d2 nb3_sym ./results/airfoil_long ./results/force_long 3 --lambda_separation 10 --init_sep 0.5
# mechanism test on the round-2 prior (same 40k/384-sim model that recorded
# 0/16 at nb=2 with the plain overlap penalty)
d2 nb2_sym_r2prior ./results/airfoil_paper ./results/force_paper 2 --lambda_separation 10 --init_sep 0.5

# ---- 8-body guidance sweep (collision ckpt @210k) + winner confirm ----
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

# ---- finite-Re cylinder anchor ----
timeout 1800 python benchmarks/bench_bdim_re_anchor.py \
  > /tmp/r3_re_anchor.log 2>&1
status re_anchor $?

# ---- 2-boundary 2D baseline rows (GD + CEM over FNO) ----
for M in GD CEM; do
  timeout 1200 python -m cindm_tpu.cli.design_2d_baseline \
    --design_method "$M" --surrogate fno --num_boundaries 2 \
    --surrogate_path ./results/fno_384 --force_model_path ./results/force_long \
    --optim_iter 100 --lr 1e-4 > /tmp/r3_2dbase_"$M".log 2>&1
  status "2dbase_$M" $?
  rec /tmp/r3_2dbase_"$M".log results/designs/r3_baseline2d_"$M"_nb2.json
done

# ---- roofline attribution ----
timeout 1200 python benchmarks/bench_roofline.py > /tmp/r3_roofline.log 2>&1
status roofline $?

# ---- paper-protocol tables (flushes per row; whatever lands, lands) ----
timeout 5400 python benchmarks/run_tables_paper.py \
  --batch_size 500 --flagship_batch 128 --skip_baselines \
  --out ./results/tables_paper.json > /tmp/r3_tables.log 2>&1
status tables_cindm $?
timeout 3600 python benchmarks/run_tables_paper.py \
  --batch_size 500 --only_bodies 0 \
  --out ./results/tables_paper_baselines.json > /tmp/r3_tables_base.log 2>&1
status tables_baselines $?

echo QUEUE_ALL_DONE
