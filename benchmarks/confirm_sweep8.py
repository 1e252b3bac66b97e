"""Confirm the 8-body guidance-sweep winner at batch 64 (paper CI width).

Reads results/designs/sweep8.json, re-runs the lowest-design_obj point at
batch 64, and records results/designs/8body_T54_winner_b64.json.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="./results/nbody2_coll")
    ap.add_argument("--milestone", type=int, default=None,
                    help="checkpoint step; None = latest milestone")
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    rows = json.load(open(os.path.join(ROOT, "results/designs/sweep8.json")))
    for extra in ("sweep8_norm.json", "sweep8_ext.json"):
        p = os.path.join(ROOT, "results/designs", extra)
        if os.path.exists(p):  # normalization ablation / extension grid
            rows = rows + json.load(open(p))
    best = min((r for r in rows if "design_obj" in r), key=lambda r: r["design_obj"])
    print("WINNER", json.dumps(best), flush=True)

    from cindm_tpu.cli import design_1d

    argv = [
        "--model_path", args.model_path,
        "--compose_n_bodies", "8", "--n_composed", "2",
        "--batch_size", str(args.batch_size), "--sample_steps", "1000",
        "--design_guidance", f"standard-recurrence-{best['recurrence']}",
        "--design_coef", str(best["design_coef"]),
        "--consistency_coef", str(best["consistency_coef"]),
        "--host_chunks", "20",
    ]
    if args.milestone is not None:
        argv += ["--milestone", str(args.milestone)]
    if best.get("normalize_grad_per_body"):
        argv += ["--normalize_grad_per_body"]
    rec = design_1d.main(argv)
    rec.update({"design_coef": best["design_coef"],
                "consistency_coef": best["consistency_coef"],
                "recurrence": best["recurrence"], "milestone": args.milestone})
    out = os.path.join(ROOT, "results/designs/8body_T54_winner_b64.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
