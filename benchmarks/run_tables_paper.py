"""Final paper-protocol Tables 1/2 runner (VERDICT round-2 #5).

Reference budgets (`scripts_paper/1D/cindm.sh`, `baseline.sh`,
`inverse_design_1d_baseline.py:87-104`):
- CinDM: val_batch_size=500, sample_steps=1000, standard-recurrence-10,
  coef 0.2/0.2 (the 2-body time-composition rows use the script's
  0.4/0.1); rows (bodies, n_composed) from cindm.sh Table 1/2 blocks.
- Baselines: CEM N=1000 / Ne=100 / 1000 iterations, backprop 1000 GD
  steps, batch 500.

Usage: python benchmarks/run_tables_paper.py --diffusion_path ./results/nbody2_coll200k
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

CKPTS = {
    "Unet": "./results/nbody-2-forward",
    "Unet_single_step": "./results/nbody-2-rollout-one",
    "GNS_autoregress": "./results/nbody-2-gns-cond-one",
    "GNS_direct": "./results/nbody-2-gns-direct",
}

# (compose_n_bodies, n_composed, design_coef, consistency_coef)
CINDM_ROWS = [
    (2, 0, 0.2, 0.2),   # Table 1: 2-body direct
    (2, 1, 0.4, 0.1),   # Table 2: 2-body, 34 steps
    (2, 2, 0.4, 0.1),   # Table 2: 2-body, 44 steps
    (2, 3, 0.4, 0.1),   # Table 2: 2-body, 54 steps
    (4, 0, 0.2, 0.2),   # Table 1: 4-body direct window
    (4, 2, 0.2, 0.2),   # Table 2: 4-body, 44 steps
    (8, 0, 0.2, 0.2),   # Table 2: 8-body, 24 steps
    (8, 2, 0.2, 0.2),   # Table 2: 8-body, 54 steps (flagship)
]


def main():
    from cindm_tpu.utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    ap = argparse.ArgumentParser()
    ap.add_argument("--diffusion_path", default="./results/nbody2_paper")
    ap.add_argument("--out", default="./results/tables_paper.json")
    ap.add_argument("--batch_size", type=int, default=500)
    ap.add_argument("--skip_baselines", action="store_true")
    ap.add_argument("--design_coef", type=float, default=None,
                    help="override the per-row design_coef (sweep winner)")
    ap.add_argument("--consistency_coef", type=float, default=None)
    ap.add_argument("--flagship_batch", type=int, default=None,
                    help="batch for the 8-body rows (recurrence-10 at n=8 is "
                    "~8x the 2-body cost per sample; lets the cheap rows run "
                    "the full 500 protocol under a wall-clock bound)")
    ap.add_argument("--only_bodies", type=int, nargs="+", default=None,
                    help="restrict CinDM rows to these compose_n_bodies")
    ap.add_argument("--only_composed", type=int, nargs="+", default=None,
                    help="restrict CinDM rows to these n_composed values")
    ap.add_argument("--milestone", type=int, default=None,
                    help="checkpoint milestone for the diffusion model")
    ap.add_argument("--flagship_winner", default=None,
                    help="path to a sweep-winner JSON (8body_T54_winner_b64)"
                    "; its design_coef/consistency_coef/recurrence override "
                    "the 8-body rows only (VERDICT r2 #5: tables from the "
                    "item-2 model at its tuned guidance)")
    args = ap.parse_args()

    flagship = None
    if args.flagship_winner and os.path.exists(args.flagship_winner):
        with open(args.flagship_winner) as f:
            flagship = json.load(f)
        print("FLAGSHIP OVERRIDE", json.dumps({k: flagship.get(k) for k in
              ("design_coef", "consistency_coef", "recurrence")}), flush=True)

    from cindm_tpu.cli import design_1d, design_1d_baseline

    rows = []
    if os.path.exists(args.out):  # resume: keep completed rows, retry errors
        try:
            rows = [r for r in json.load(open(args.out)) if "error" not in r]
            if rows:
                print(f"RESUME: {len(rows)} completed rows in {args.out}",
                      flush=True)
        except Exception:
            rows = []
    done_cindm = {(r.get("n_bodies"), r.get("n_composed"))
                  for r in rows if r.get("method") == "CinDM"}
    done_base = {r.get("method") for r in rows if r.get("method") != "CinDM"}

    def flush():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    for n_bodies, n_comp, dc, cc in CINDM_ROWS:
        if (n_bodies, n_comp) in done_cindm:
            print(f"SKIP (done) CinDM {n_bodies}-body n_composed={n_comp}",
                  flush=True)
            continue
        if args.only_bodies is not None and n_bodies not in args.only_bodies:
            continue
        if args.only_composed is not None and n_comp not in args.only_composed:
            continue
        if args.design_coef is not None:
            dc = args.design_coef
        if args.consistency_coef is not None:
            cc = args.consistency_coef
        bs = args.batch_size
        recurrence = 10
        if n_bodies == 8:
            if args.flagship_batch is not None:
                bs = args.flagship_batch
            if flagship is not None:
                dc = flagship.get("design_coef", dc)
                cc = flagship.get("consistency_coef", cc)
                recurrence = flagship.get("recurrence", recurrence)
        t0 = time.time()
        try:
            argv = [
                "--model_path", args.diffusion_path,
                "--compose_n_bodies", str(n_bodies),
                "--n_composed", str(n_comp),
                "--batch_size", str(bs),
                "--sample_steps", "1000",
                "--design_guidance", f"standard-recurrence-{recurrence}",
                "--design_coef", str(dc), "--consistency_coef", str(cc),
                "--host_chunks", "20",
            ]
            if args.milestone is not None:
                argv += ["--milestone", str(args.milestone)]
            rec = design_1d.main(argv)
            rows.append({"method": "CinDM", "n_bodies": n_bodies,
                         "n_composed": n_comp, "design_coef": dc,
                         "consistency_coef": cc,
                         "wall_s": round(time.time() - t0, 1), **{
                k: v for k, v in rec.items() if isinstance(v, (int, float, str))
            }})
        except Exception as e:
            rows.append({"method": "CinDM", "n_bodies": n_bodies,
                         "n_composed": n_comp, "error": repr(e)})
        print("ROW", json.dumps(rows[-1]), flush=True)
        flush()

    if not args.skip_baselines:
        for design_method in ("backprop", "CEM"):
            for model, path in CKPTS.items():
                if f"{design_method}/{model}" in done_base:
                    print(f"SKIP (done) {design_method}/{model}", flush=True)
                    continue
                t0 = time.time()
                try:
                    rec = design_1d_baseline.main([
                        "--design_method", design_method,
                        "--method_type", model,
                        "--model_path", path,
                        "--n_bodies", "2", "--rollout_steps", "23",
                        "--batch_size", str(args.batch_size),
                        "--max_design_steps", "1000",
                        "--N", "1000", "--Ne", "100",
                    ])
                    rows.append({"method": f"{design_method}/{model}",
                                 "wall_s": round(time.time() - t0, 1), **rec})
                except Exception as e:
                    rows.append({"method": f"{design_method}/{model}",
                                 "error": repr(e)})
                print("ROW", json.dumps(rows[-1]), flush=True)
                flush()

    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
