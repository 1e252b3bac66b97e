#!/bin/bash
# Round-5 continuation queue (supersedes round5_queue.sh, which lost its
# first job to a watchdog/compile interaction — see below). Reordered so the
# nb=3 wide-band chain (VERDICT r4 task 2, the last zero-evidence reference
# capability) cannot be starved by earlier steps:
#
#   G.   chunked v3 datagen (resumable, per-chunk heartbeat prints)
#   C1.  ForceUnet v3
#   C2.  2D prior on v3, budget-capped against a designs+flagship reserve
#   P.   insurance persist of the v3 prior + ForceUnet
#   C3.  designs nb1 -> nb3 -> nb2 (nb3 promoted: it's the missing one)
#   F0b. flagship (8,2) row at the paper's batch 500 (task 3 protocol half)
#   D'.  1D prior 200k -> 400k elastic (task 3 budget half) + F1 re-row
#   X.   arch-ablation bench (stretch task 8)
#   C1b/C4. FNO v3 + CEM/GD nb=2 baseline rows (task 4)
#   A/B. 1D surrogates + baseline tables (task 4, elastic leftovers)
#
# Watchdog lesson (22:17 UTC): first compiles on this tunnel are log-silent
# for 10-15 min (RESULTS.md round 5); a flat 900 s log-silence budget shot a
# healthy flagship run mid-compile. wd now allows LOGSTALL_COLD before the
# job's FIRST output and LOGSTALL after it.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
export CINDM_REQUIRE_TPU=1
export PYTHONPATH=/root/repo:${PYTHONPATH:-/root/.axon_site}

if [ -n "${QUEUE_END:-}" ]; then END_S=$(date -u -d "$QUEUE_END" +%s)
else END_S=$(( $(date -u +%s) + ${WINDOW_S:-24600} )); fi
left() { echo $(( END_S - $(date -u +%s) )); }

STALL=${STALL:-420}
GRACE=${GRACE:-90}
LOGSTALL=${LOGSTALL:-900}
LOGSTALL_COLD=${LOGSTALL_COLD:-1800}
status() { echo "=== $1 rc=$2 @ $(date -u +%H:%M:%S) left=$(left)s"; }
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo ""; }

wd() {  # wd <hard_timeout_s> <log> <cmd...>
  local hard=$1 log=$2; shift 2
  while [ -f /tmp/q_pause ]; do sleep 20; done
  local l; l=$(left)
  [ "$l" -le 120 ] && { echo "WD: past QUEUE_END, skipping: $*"; return 99; }
  [ "$hard" -gt "$l" ] && hard=$l
  : > "$log"
  setsid "$@" > "$log" 2>&1 &
  local pid=$! t0=$SECONDS last_prog=$SECONDS last_logprog=$SECONDS
  local last_cpu="" last_sz=0 seen_output=0
  grpkill() {
    kill -- -"$pid" 2>/dev/null; sleep 5
    kill -9 -- -"$pid" 2>/dev/null; wait "$pid" 2>/dev/null
  }
  while kill -0 "$pid" 2>/dev/null; do
    sleep 15
    local el=$((SECONDS - t0))
    if [ "$el" -ge "$hard" ]; then
      echo "WD: hard timeout ${hard}s, killing group $pid"; grpkill; return 124
    fi
    local cpu sz; cpu=$(cpu_ticks "$pid"); sz=$(stat -c %s "$log" 2>/dev/null || echo 0)
    if [ "$sz" != "$last_sz" ]; then
      last_logprog=$SECONDS
      [ "$sz" -gt 0 ] && seen_output=1
    else
      # two-phase silence budget: cold compiles are log-silent 10-15 min
      local lim=$LOGSTALL; [ "$seen_output" -eq 0 ] && lim=$LOGSTALL_COLD
      if [ "$el" -gt "$GRACE" ] && [ $((SECONDS - last_logprog)) -ge "$lim" ]; then
        echo "WD: log silent ${lim}s (seen_output=$seen_output), killing group $pid"
        grpkill; return 126
      fi
    fi
    if [ "$cpu" != "$last_cpu" ] || [ "$sz" != "$last_sz" ]; then
      last_prog=$SECONDS; last_cpu=$cpu; last_sz=$sz
    elif [ "$el" -gt "$GRACE" ] && [ $((SECONDS - last_prog)) -ge "$STALL" ]; then
      echo "WD: stalled ${STALL}s (cpu=$cpu sz=$sz el=${el}s), killing group $pid"
      grpkill; return 125
    fi
  done
  wait "$pid"; return $?
}
done_rec() { [ -s "$1" ] && { echo "=== skip (have $1)"; return 0; } || return 1; }
rec() { grep -a '^{' "$1" | tail -1 > "$2" 2>/dev/null && [ -s "$2" ] && cat "$2"; }
ci() {
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && echo "=== committed: $msg"
}
latest_ms() { ls "$1" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1; }

# ---- G. chunked wide-band v3 dataset (resumable; heartbeat per 64 sims) ----
if [ ! -f dataset/airfoil_1024_v3/fields.npy ]; then
  for try in 1 2 3; do
    wd 6600 /tmp/r5_gen_v3.log python scripts_paper/gen_airfoil_v3.py
    rc=$?; status gen_v3-try$try $rc
    [ "$rc" -eq 0 ] && break
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
fi

# ---- C1. ForceUnet v3 (dataset cache hit -> pure training) ----
if [ -f dataset/airfoil_1024_v3/fields.npy ] && [ ! -f results/force_v3/.done ]; then
  for try in 1 2; do
    wd 3000 /tmp/r5_force_v3.log \
      python -m cindm_tpu.cli.train_force \
        --is_testdata False --n_sims 1024 --y_band 0.2 0.8 \
        --data_cache dataset/airfoil_1024_v3 \
        --train_num_steps 8000 --batch_size 32 \
        --results_folder ./results/force_v3
    rc=$?; status force_v3-try$try $rc
    [ "$rc" -eq 0 ] && { touch results/force_v3/.done; break; }
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
fi

# ---- C2. 2D prior on v3 (budget-capped vs the designs+flagship reserve) ----
C2_RESERVE=${C2_RESERVE:-13500}   # C3 3x2400 + F0b 5400 + slack 900
if [ -f results/force_v3/.done ] && [ ! -f results/airfoil_v3/.done ]; then
  while :; do
    budget=$(( $(left) - C2_RESERVE ))
    [ "$budget" -gt 7200 ] && budget=7200
    [ "$budget" -le 600 ] && { echo "=== train2d_v3 budget exhausted"; break; }
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
    [ "$rc" -eq 124 ] && break   # budget spent; milestones are saved
    [ "$rc" -eq 99 ] && break
    sleep 10
  done
fi

# ---- P. insurance persist of the v3 prior + ForceUnet ----
M3=$(latest_ms results/airfoil_v3)
if [ -n "${M3:-}" ] && [ "${M3:-0}" -ge 20000 ] \
   && ! ls results/airfoil_v3/persisted_m*.npz >/dev/null 2>&1; then
  python benchmarks/persist_ckpt.py --results_folder ./results/airfoil_v3 \
    --model unet2d --milestone "$M3" --ema_only True --dtype bfloat16 \
  && python benchmarks/persist_ckpt.py --results_folder ./results/force_v3 \
    --model force --ema_only True --dtype bfloat16 \
  && ci "Persist wide-band v3 2D prior (step ${M3}) + ForceUnet v3 (EMA bf16)" \
       "results/airfoil_v3/persisted_m${M3}.npz" results/force_v3/persisted_m*.npz
  status persist_v3 $?
fi

# ---- C3. region-partition designs on the wide-band prior ----
d2() {  # d2 <name> <nb> [extra design_2d flags...]
  local name=$1 nb=$2; shift 2
  local out="results/designs/r5v3_${name}.json"
  done_rec "$out" && return 0
  wd 2400 /tmp/r5_design_"$name".log \
    python -m cindm_tpu.cli.design_2d \
      --model_path ./results/airfoil_v3 --force_model_path ./results/force_v3 \
      --num_boundaries "$nb" --batch_size 16 --design_guidance standard-alpha \
      --coeff_ratio 2e-4 --evaluate True "$@"
  local rc=$?; status "design_$name" $rc
  if [ "$rc" -eq 0 ] && rec /tmp/r5_design_"$name".log "$out"; then
    ci "2D v3 wide-band design: ${name}" "$out"
  else
    rm -f "$out"   # keep the retry path open (ADVICE r4 medium)
  fi
}
M3=$(latest_ms results/airfoil_v3)
if [ -f results/force_v3/.done ] && [ "${M3:-0}" -ge 20000 ]; then
  d2 nb1 1
  d2 nb3_region 3 --region_partition y --region_band 0.2 0.8
  d2 nb2_region 2 --region_partition y --region_band 0.2 0.8
fi

# ---- F0b. flagship (8,2) row at batch 500 on the 200k prior ----
# (VERDICT r4 weak #2; the (8,0) row re-runs later only if window remains)
if [ ! -s results/tables_paper_b500_m200k.json ] && [ "$(left)" -gt 3000 ]; then
  wd 5400 /tmp/r5_flag500.log \
    python benchmarks/run_tables_paper.py \
      --diffusion_path ./results/nbody2_coll --skip_baselines \
      --only_bodies 8 --only_composed 2 --batch_size 500 \
      --flagship_winner results/designs/8body_T54_winner_b64.json \
      --out ./results/tables_paper_b500_m200k.json
  rc=$?; status flagship_b500 $rc
  [ "$rc" -eq 0 ] && ci "Flagship 8-body/54-step at the paper's batch 500 (200k prior)" results/tables_paper_b500_m200k.json
fi

# ---- D'. elastic 1D-prior extension 200k -> 400k ----
while :; do
  budget=$(( $(left) - 3300 ))
  [ "$budget" -le 600 ] && { echo "=== train1d-ext: no window left"; break; }
  [ "$budget" -gt 5400 ] && budget=5400
  wd "$budget" /tmp/r5_train1d.log \
    python -m cindm_tpu.cli.train_1d \
      --dataset nbody-2 --conditioned_steps 0 --rollout_steps 24 \
      --batch_size 512 --gradient_accumulate_every 1 --Unet_dim 64 \
      --n_sims 6000 --test_sims 100 --collision_frac 0.3 \
      --train_num_steps 400000 --save_and_sample_every 5000 \
      --steps_per_launch 25 --log_every 1000 \
      --results_folder ./results/nbody2_coll --resume True
  rc=$?; status train1d_ext $rc
  { [ "$rc" -eq 0 ] || [ "$rc" -eq 124 ] || [ "$rc" -eq 99 ]; } && break
  sleep 10
done
M1=$(latest_ms results/nbody2_coll)
if [ -n "${M1:-}" ] && [ "${M1:-0}" -gt 200000 ] \
   && [ ! -s "results/nbody2_coll/persisted_m${M1}.npz" ]; then
  python benchmarks/persist_ckpt.py --results_folder ./results/nbody2_coll \
    --milestone "$M1" --ema_only True --dtype bfloat16 \
  && { git ls-files 'results/nbody2_coll/persisted_m*.npz' | grep -v "m${M1}" \
         | xargs -r git rm -q --cached
       ci "Persist 1D collision prior at step ${M1} (EMA bf16; supersedes 200k)" \
          "results/nbody2_coll/persisted_m${M1}.npz"; }
  status persist_1d $?
fi

# ---- F1. flagship (8,2) batch-500 row on the extended prior ----
M1=$(latest_ms results/nbody2_coll)
if [ -n "${M1:-}" ] && [ "${M1:-0}" -gt 200000 ] && [ "$(left)" -gt 2700 ]; then
  out="results/tables_paper_b500_m${M1}.json"
  if [ ! -s "$out" ]; then
    wd 4500 /tmp/r5_flag500b.log \
      python benchmarks/run_tables_paper.py \
        --diffusion_path ./results/nbody2_coll --milestone "$M1" \
        --skip_baselines --only_bodies 8 --only_composed 2 --batch_size 500 \
        --flagship_winner results/designs/8body_T54_winner_b64.json \
        --out "./$out"
    rc=$?; status flagship_b500_ext $rc
    [ "$rc" -eq 0 ] && ci "Flagship 8-body/54-step at batch 500 on the ${M1}-step prior" "$out"
  fi
fi

# ---- X. arch-ablation bench (stretch task 8) ----
if [ ! -s results/arch_ablation.json ] && [ "$(left)" -gt 1800 ]; then
  wd 1800 /tmp/r5_ablate.log python benchmarks/bench_arch_ablation.py
  rc=$?; status arch_ablation $rc
  [ -s results/arch_ablation.json ] && \
    ci "Arch ablation measured: horizon-32 padding + additive skips vs baseline" results/arch_ablation.json
fi

# ---- C1b. FNO surrogate on v3 (feeds the 2D baseline rows) ----
if [ -f results/force_v3/.done ] && [ ! -f results/fno_v3/.done ] \
   && [ "$(left)" -gt 5400 ]; then
  wd 2700 /tmp/r5_fno_v3.log \
    python -m cindm_tpu.cli.train_baseline \
      --algo fno --is_unittest False --is_testdata False --n_sims 1024 \
      --y_band 0.2 0.8 --data_cache dataset/airfoil_1024_v3 \
      --epochs 10 --steps_per_epoch 500 --batch_size 16 \
      --results_folder ./results/fno_v3
  rc=$?; status fno_v3 $rc
  [ "$rc" -eq 0 ] && touch results/fno_v3/.done
fi

# ---- C4. 2D GD/CEM nb=2 baseline rows on v3 ----
if [ -f results/fno_v3/.done ] && [ -f results/force_v3/.done ]; then
  for MTH in CEM GD; do
    out="results/designs/r5v3_baseline2d_${MTH}_nb2.json"
    done_rec "$out" && continue
    [ "$(left)" -le 2400 ] && break
    wd 2400 /tmp/r5_2dbase_"$MTH".log \
      python -m cindm_tpu.cli.design_2d_baseline \
        --design_method "$MTH" --surrogate fno --num_boundaries 2 \
        --surrogate_path ./results/fno_v3 --force_model_path ./results/force_v3 \
        --y_band 0.2 0.8 --data_dir dataset/b2dinit_v3 --n_sims 16 \
        --batch_size 8 --optim_iter 100 --lr 1e-4
    rc=$?; status "2dbase_$MTH" $rc
    if [ "$rc" -eq 0 ] && rec /tmp/r5_2dbase_"$MTH".log "$out"; then
      ci "2D baseline ${MTH} nb=2 row on v3 (r4v2 artifact lost with the VM)" "$out"
    else
      rm -f "$out"
    fi
  done
fi

# ---- A. 1D baseline surrogates (milestone-aware skip; ADVICE r4 high) ----
tr1d() {
  local folder=$1 method=$2 steps=$3 try last
  for try in 1 2; do
    last=$(latest_ms "results/$folder")
    [ "${last:-0}" -ge "$steps" ] && { echo "=== skip $folder (at ${last})"; return 0; }
    [ "$(left)" -le 2700 ] && return 99
    wd 2400 "/tmp/r5_base_$folder.log" \
      python -m cindm_tpu.cli.train_1d --method_type "$method" \
        --dataset nbody-2 --rollout_steps 24 --batch_size 32 \
        --train_num_steps "$steps" --save_and_sample_every 5000 \
        --steps_per_launch 25 --gradient_accumulate_every 1 --log_every 500 \
        --results_folder "./results/$folder" --resume True
    local rc=$?; status "$folder-try$try" $rc
    [ "$rc" -eq 99 ] && return 99
    sleep 5
  done
  last=$(latest_ms "results/$folder")
  [ "${last:-0}" -ge "$steps" ]
}
pers1d() {
  local folder=$1 last
  last=$(latest_ms "results/$folder")
  [ -z "${last:-}" ] && return 1
  [ -s "results/$folder/persisted_m${last}.npz" ] && return 0
  python benchmarks/persist_ckpt.py --results_folder "./results/$folder" \
    --model raw --milestone "$last" --ema_only True --dtype bfloat16 \
  && ci "Persist 1D surrogate $folder (step ${last}, EMA bf16)" \
       "results/$folder/persisted_m${last}.npz"
}
if [ "$(left)" -gt 3600 ]; then
  tr1d nbody-2-forward forward_model 20000       && pers1d nbody-2-forward
  tr1d nbody-2-rollout-one Unet_rollout_one 20000 && pers1d nbody-2-rollout-one
  tr1d nbody-2-gns-cond-one GNS_cond_one 10000    && pers1d nbody-2-gns-cond-one
  tr1d nbody-2-gns-direct GNS_direct 10000        && pers1d nbody-2-gns-direct
fi

# ---- B. baseline paper tables at reference design budgets ----
if [ ! -f results/designs/.tablesbase_r5 ] && [ "$(left)" -gt 3600 ]; then
  budget=$(( $(left) - 900 )); [ "$budget" -gt 10800 ] && budget=10800
  wd "$budget" /tmp/r5_tables_base.log \
    python benchmarks/run_tables_paper.py \
      --batch_size 500 --only_bodies 0 \
      --out ./results/tables_paper_baselines.json
  rc=$?; status tables_baselines $rc
  [ -s results/tables_paper_baselines.json ] && \
    ci "Baseline paper tables at reference budgets (batch 500)" results/tables_paper_baselines.json
  [ "$rc" -eq 0 ] && touch results/designs/.tablesbase_r5
fi

echo "R5_QUEUE2_DONE @ $(date -u +%H:%M:%S) left=$(left)s"

# ---- F0c. (8,0) 24-step row at batch 500 (appended tail; runs only if
#      window remains — completes the 8-body paper-protocol pair) ----
if [ ! -s results/tables_paper_b500_8b0.json ] && [ "$(left)" -gt 2400 ]; then
  wd 3600 /tmp/r5_flag500c.log \
    python benchmarks/run_tables_paper.py \
      --diffusion_path ./results/nbody2_coll --skip_baselines \
      --only_bodies 8 --only_composed 0 --batch_size 500 \
      --flagship_winner results/designs/8body_T54_winner_b64.json \
      --out ./results/tables_paper_b500_8b0.json
  rc=$?; status flagship_b500_8b0 $rc
  [ "$rc" -eq 0 ] && ci "8-body/24-step row at the paper's batch 500" results/tables_paper_b500_8b0.json
fi
echo "R5_QUEUE2_TAIL_DONE @ $(date -u +%H:%M:%S) left=$(left)s"
