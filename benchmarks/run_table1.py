"""Table-1-style comparison driver: CinDM vs trained baseline surrogates.

Runs `design_1d` (compositional diffusion) and `design_1d_baseline`
(backprop/CEM over Unet / Unet_single_step / GNS_autoregress / GNS_direct,
each loading its own trained checkpoint) with shared eval_simu scoring, and
writes one JSON table — the reproduction of the reference's Table 1 recipe
(`scripts_paper/1D/{cindm,baseline}.sh`) with the on-device simulator as
the judge.

Usage: python benchmarks/run_table1.py [--quick]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json

CKPTS = {
    "Unet": "./results/nbody-2-forward",
    "Unet_single_step": "./results/nbody-2-rollout-one",
    "GNS_autoregress": "./results/nbody-2-gns-cond-one",
    "GNS_direct": "./results/nbody-2-gns-direct",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small budgets for smoke")
    ap.add_argument("--diffusion_path", default="./results/nbody2_paper")
    ap.add_argument("--out", default="./results/table1.json")
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    from cindm_tpu.cli import design_1d, design_1d_baseline

    rows = []

    # CinDM rows: direct 2-body + composed 4-body (paper Table 1 setting)
    for n_bodies, n_comp in ((2, 0), (4, 0)):
        try:
            rec = design_1d.main([
                "--model_path", args.diffusion_path,
                "--compose_n_bodies", str(n_bodies),
                "--n_composed", str(n_comp),
                "--batch_size", str(args.batch_size),
                "--sample_steps", "100" if args.quick else "1000",
                "--design_guidance", "standard-recurrence-10",
                "--host_chunks", "10",
            ])
            rows.append({"method": "CinDM", "n_bodies": n_bodies, **{
                k: v for k, v in rec.items() if isinstance(v, (int, float, str))
            }})
        except Exception as e:  # keep the table going; record the failure
            rows.append({"method": "CinDM", "n_bodies": n_bodies, "error": repr(e)})

    for design_method in ("backprop", "CEM"):
        for model, path in CKPTS.items():
            try:
                rec = design_1d_baseline.main([
                    "--design_method", design_method,
                    "--method_type", model,
                    "--model_path", path,
                    "--n_bodies", "2", "--rollout_steps", "23",
                    "--batch_size", str(args.batch_size),
                    "--max_design_steps", "10" if args.quick else
                    ("100" if design_method == "CEM" else "1000"),
                    "--N", "100" if args.quick else "1000",
                    "--Ne", "10" if args.quick else "100",
                ])
                rows.append({"method": f"{design_method}/{model}", **rec})
            except Exception as e:
                rows.append({"method": f"{design_method}/{model}", "error": repr(e)})

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
