"""8-body/54-step guidance-coefficient sweep (VERDICT round-2 #2).

RESULTS.md (round 2) hypothesized that the flagship 8-body composed config
is guidance-limited rather than prior-limited; this sweeps
design_coef x consistency_coef x guidance variant at the flagship geometry
(compose_n_bodies 8, n_composed 2 => 54 steps) and records every point.

Run: python scripts_paper/sweep_8body.py --model_path ./results/nbody2_coll200k
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cindm_tpu.cli.design_1d import main as design_main


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", default="./results/nbody2_paper")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--out", default="results/designs/sweep_8body.json")
    p.add_argument("--design_coefs", type=float, nargs="+", default=[0.1, 0.2, 0.4])
    p.add_argument("--consistency_coefs", type=float, nargs="+", default=[0.2, 0.6])
    p.add_argument("--guidances", nargs="+",
                   default=["standard-recurrence-10", "standard-recurrence-4"])
    args = p.parse_args()

    rows = []
    for g in args.guidances:
        for dc in args.design_coefs:
            for cc in args.consistency_coefs:
                t0 = time.time()
                rec = design_main([
                    "--model_path", args.model_path,
                    "--compose_n_bodies", "8", "--n_composed", "2",
                    "--batch_size", str(args.batch_size),
                    "--sample_steps", "1000", "--host_chunks", "20",
                    "--design_guidance", g,
                    "--design_coef", str(dc),
                    "--consistency_coef", str(cc),
                ])
                rec.update({"design_coef": dc, "consistency_coef": cc,
                            "wall_s": round(time.time() - t0, 1)})
                rows.append(rec)
                print("SWEEP", json.dumps(rec), flush=True)
                os.makedirs(os.path.dirname(args.out), exist_ok=True)
                with open(args.out, "w") as f:
                    json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
