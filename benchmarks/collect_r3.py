"""Collect the round-3 overnight-queue records into one markdown block.

Reads results/designs/r3_*.json, sweep8.json, 8body_T54_winner_b64.json,
the finite-Re anchor log, the 2-boundary baseline records, and the paper
tables (if they landed), and prints the RESULTS.md fill. Records that are
missing are reported as missing rather than silently skipped.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
D = os.path.join(ROOT, "results", "designs")


def load(path):
    p = os.path.join(ROOT, path)
    if not os.path.exists(p) or os.path.getsize(p) == 0:
        return None
    with open(p) as f:
        return json.load(f)


def jlines(path):
    """All JSON lines from a log file."""
    p = path if os.path.isabs(path) else os.path.join(ROOT, path)
    out = []
    if not os.path.exists(p):
        return out
    with open(p, errors="replace") as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def fmt(x, nd=3):
    return "—" if x is None else f"{x:.{nd}f}"


def main():
    missing = []

    # ---- 2D designs on the v2 prior (post Poisson-BC fix) ----
    print("## 2D designs (v2 prior: airfoil_v2, corrected solver, 1024 sims)\n")
    print("| run | nb | valid | drag_min | lift_max | L/D max | Cd_min | Cl_max |")
    print("|---|---|---|---|---|---|---|---|")
    for name in ["nb1", "nb2_sym", "nb2", "nb3_sym"]:
        r = load(f"results/designs/r3v2_{name}.json")
        if r is None:
            missing.append(f"r3v2_{name}.json")
            continue
        print(
            f"| {name} | {r['num_boundaries']} | {r['valid_designs']}/{r['batch_size']} "
            f"| {fmt(r.get('drag_min'))} | {fmt(r.get('lift_max'))} "
            f"| {fmt(r.get('lift_over_drag_max'))} | {fmt(r.get('cd_min'), 4)} "
            f"| {fmt(r.get('cl_max'))} |"
        )
    print()

    # ---- 8-body sweep ----
    rows = load("results/designs/sweep8.json")
    if rows:
        print("## 8-body guidance sweep (coll@210k, batch 32)\n")
        print("| design_coef | consistency_coef | rec | design_obj ± CI | MAE |")
        print("|---|---|---|---|---|")
        for r in sorted(rows, key=lambda r: r.get("design_obj", 9e9)):
            if "design_obj" not in r:
                continue
            print(
                f"| {r['design_coef']} | {r['consistency_coef']} | {r['recurrence']} "
                f"| {r['design_obj']:.4f} ± {r.get('design_obj_ci95', 0):.3f} "
                f"| {fmt(r.get('MAE'), 3)} |"
            )
        print()
    else:
        missing.append("sweep8.json")

    w = load("results/designs/8body_T54_winner_b64.json")
    if w:
        print(
            f"Winner confirm @ batch 64: design_obj {w['design_obj']:.4f} ± "
            f"{w.get('design_obj_ci95', float('nan')):.3f}, MAE {fmt(w.get('MAE'))} "
            f"(coef {w.get('design_coef')}, cons {w.get('consistency_coef')}, "
            f"rec {w.get('recurrence')})\n"
        )
    else:
        missing.append("8body_T54_winner_b64.json")

    # ---- finite-Re anchor (results/bdim_re_anchor.json is authoritative:
    # written per-row by bench_bdim_re_anchor.py on the corrected geometry) ----
    anchor = load("results/bdim_re_anchor.json")
    if anchor:
        print("## Finite-Re cylinder anchor (QUICK+viscous BDIM)\n")
        print("| Re | n | Cd mean | St | bubble/D | target |")
        print("|---|---|---|---|---|---|")
        tgt = {40: "Cd 1.5-1.6, Lb/D 2.2-2.3", 100: "Cd 1.32-1.45, St 0.16-0.17"}
        for r in anchor:
            print(
                f"| {r['re']} | {r['n']} | {r.get('cd_mb', r['cd_mean']):.3f} "
                f"| {r['strouhal']:.3f} "
                f"| {r['bubble_over_D']:.2f} | {tgt.get(r['re'], '')} |"
            )
        print()
    else:
        missing.append("bdim_re_anchor.json")

    # ---- 2-boundary baselines ----
    for m in ["GD", "CEM"]:
        r = load(f"results/designs/r3v2_baseline2d_{m}_nb2.json")
        if r is None:
            missing.append(f"r3v2_baseline2d_{m}_nb2.json")
        else:
            print(f"2D baseline {m} nb=2: {json.dumps(r)}\n")

    # ---- paper tables ----
    for name in ["tables_paper.json", "tables_paper_baselines.json"]:
        t = load(f"results/{name}")
        if t is None:
            missing.append(name)
        else:
            print(f"## {name}\n")
            for r in t:
                print(json.dumps(r))
            print()

    if missing:
        print("MISSING RECORDS: " + ", ".join(missing), file=sys.stderr)


if __name__ == "__main__":
    main()
