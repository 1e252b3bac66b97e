"""8-body/54-step guidance-coefficient sweep (VERDICT round-2 #2).

RESULTS.md hypothesizes the 8-body composed config (flagship, Table 2 of
arXiv:2401.13171) needs guidance tuning at large n rather than more
training: the collision-enrichment lever plateaued (0.3185 at +10k
fine-tune, 0.3256 at +40k). This sweeps design_coef x consistency_coef x
recurrence-K on `design_1d --compose_n_bodies 8 --n_composed 2` and
records every point (favorable or not) to results/designs/sweep8.json.

Reference anchor: the paper script fixes coef 0.2/0.2 with
standard-recurrence-10 for all rows (`scripts_paper/1D/cindm.sh`); the
sweep asks whether that transfer to n=8 is optimal.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import itertools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="./results/nbody2_coll")
    ap.add_argument("--milestone", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--out", default="./results/designs/sweep8.json")
    ap.add_argument("--design_coefs", type=float, nargs="+",
                    default=[0.1, 0.2, 0.4])
    ap.add_argument("--consistency_coefs", type=float, nargs="+",
                    default=[0.2, 0.6])
    ap.add_argument("--recurrences", type=int, nargs="+", default=[10, 20])
    ap.add_argument("--normalize_grad_per_body", action="store_true",
                    help="run the per-body gradient-normalization ablation "
                         "(design_1d --normalize_grad_per_body)")
    args = ap.parse_args()

    from cindm_tpu.cli import design_1d

    rows = []

    def flush():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    grid = list(itertools.product(
        args.design_coefs, args.consistency_coefs, args.recurrences))
    for dc, cc, rec_k in grid:
        t0 = time.time()
        argv = [
            "--model_path", args.model_path,
            "--compose_n_bodies", "8", "--n_composed", "2",
            "--batch_size", str(args.batch_size),
            "--sample_steps", "1000",
            "--design_guidance", f"standard-recurrence-{rec_k}",
            "--design_coef", str(dc), "--consistency_coef", str(cc),
            "--host_chunks", "20",
        ]
        if args.milestone is not None:
            argv += ["--milestone", str(args.milestone)]
        if args.normalize_grad_per_body:
            argv += ["--normalize_grad_per_body"]
        try:
            rec = design_1d.main(argv)
            rows.append({"design_coef": dc, "consistency_coef": cc,
                         "recurrence": rec_k,
                         "wall_s": round(time.time() - t0, 1), **rec})
        except Exception as e:  # record the failure, keep sweeping
            rows.append({"design_coef": dc, "consistency_coef": cc,
                         "recurrence": rec_k, "error": repr(e)})
        print("POINT", json.dumps(rows[-1]), flush=True)
        flush()

    best = min((r for r in rows if "design_obj" in r),
               key=lambda r: r["design_obj"], default=None)
    print("BEST", json.dumps(best))


if __name__ == "__main__":
    main()
