"""Finite-Reynolds cylinder anchor for the QUICK+viscous BDIM branch.

Published targets (classical, many independent sources):
- Re = 40: steady flow, Cd = 1.5-1.6, recirculation bubble length ~2.2-2.3 D
  (Tritton 1959 experiment; Dennis & Chang 1970; Linnick & Fasel 2005).
- Re = 100: periodic shedding, mean Cd = 1.32-1.45, St = 0.16-0.17
  (Williamson 1996 experiments; Linnick & Fasel 2005: Cd 1.34, St 0.166;
  LilyPad's own validation regime, Maertens & Weymouth 2015).

Run on TPU (fast) or CPU: PYTHONPATH=. python benchmarks/bench_bdim_re_anchor.py
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    # env alone is too late on this image: sitecustomize registers the
    # axon platform at interpreter startup (tests/conftest.py gotcha), and
    # a dead tunnel then hangs backend init in a connect-retry sleep loop.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import json

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.physics.bdim import (
    BDIMConfig,
    ellipse_coords,
    momentum_balance_drag,
    simulate_flow,
)


def ccw(coords: np.ndarray) -> np.ndarray:
    x, y = coords[:, 0], coords[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        coords = coords[::-1].copy()
    return coords


def run(re: float, n: int, D: float, n_warmup: int, n_record: int, dt: float = 0.3):
    cfg = BDIMConfig(n=n, dt=dt, nu=D / re, quick=True, cg_iters=120)
    cx, cy = n / 3.0 + 0.5, n / 2.0 + 0.37
    # ellipse_coords h = FULL height (reference CircleBody d = diameter,
    # `Body.pde:397-421`). Passing D/2 here halved the body: every pre-fix
    # anchor ran at Re_eff = Re/2 with force normalized by 2x the true
    # diameter (measured cd_mb 0.99 = half of Cd(Re=20) ~ 2.0 — the solver
    # was right, the harness geometry was wrong).
    coords = ccw(ellipse_coords(cx, cy, D, 1.0, m=64))
    (us, vs, ps), fs = simulate_flow(cfg, jnp.asarray(coords), n_warmup, n_record)
    f = np.asarray(fs)[:, 0]
    q = 0.5 * D
    # Two drag measures (see physics/bdim.py:momentum_balance_drag docstring):
    # the surface pressure integral under-counts by the BDIM kernel smear
    # (eps/D-dependent) and excludes friction; the control-volume momentum
    # balance captures TOTAL drag and is the anchor-grade number. Averaged
    # over the recorded frames (unsteady CV terms cancel over full periods).
    cd_mb = float(
        jnp.mean(jax.vmap(lambda uu, pp: momentum_balance_drag(uu, pp))(us, ps)) / q
    )
    cd = f[:, 0] / q
    cl = f[:, 1] / q
    cl_d = cl - cl.mean()
    spec = np.abs(np.fft.rfft(cl_d * np.hanning(len(cl_d))))
    freqs = np.fft.rfftfreq(len(cl_d), d=dt)
    # parabolic peak interpolation: the raw bin spacing is 1/(n_record·dt)
    # ≈ 0.002 → ΔSt ≈ 0.03 at D=16, too coarse next to the published 0.166
    k = int(np.argmax(spec[1:])) + 1
    if 1 <= k < len(spec) - 1:
        a, b, c = spec[k - 1], spec[k], spec[k + 1]
        denom = a - 2 * b + c
        shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
    else:
        shift = 0.0
    st = float((freqs[k] + shift * (freqs[1] - freqs[0]))) * D

    # recirculation bubble length: last u<0 cell on the centreline behind body
    u_late = np.asarray(us[-1])  # [n, n] interior, i=x
    jc = int(round(cy)) - 1
    wake = u_late[int(round(cx + D / 2)) :, jc]
    neg = np.nonzero(wake < 0)[0]
    bubble = float(neg[-1] + 1) / D if len(neg) else 0.0
    return {
        "re": re,
        "n": n,
        "D": D,
        "cd_mb": cd_mb,
        "cd_mean": float(cd.mean()),
        "cd_std": float(cd.std()),
        "cl_rms": float(np.sqrt((cl_d**2).mean())),
        "strouhal": st,
        "bubble_over_D": bubble,
        "t_end": (n_warmup + n_record) * dt,
    }


if __name__ == "__main__":
    out_path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "results", "bdim_re_anchor.json")
    try:
        with open(out_path) as f:
            rows = json.load(f)
    except (OSError, ValueError):
        rows = []
    done = {(r["re"], r["n"], r["t_end"]) for r in rows}

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(rows, f, indent=1)

    def emit_if_new(re, n, **kw):
        # per-row resume: a killed run keeps its completed rows
        t_end = (kw["n_warmup"] + kw["n_record"]) * kw.get("dt", 0.3)
        if (re, n, t_end) in done:
            print(f"skip re={re} n={n} t_end={t_end} (have row)", flush=True)
            return
        # heartbeat BEFORE the long remote compile so log-silence
        # watchdogs don't shoot a healthy run (round-5: first compiles
        # took 10-15 min on a loaded compile server)
        print(f"running re={re} n={n} t_end={t_end} ...", flush=True)
        emit(run(re, n, **kw))

    # Re 40: steady by t*~30 (t* = t·U/D); record once settled
    emit_if_new(40, 128, D=16.0, n_warmup=1600, n_record=400)
    # Re 100: shedding grows from the 0.37-cell off-center seed; from an
    # impulsive start saturation needs t* ≳ 120, so warm up to t* = 120
    # and record ~5 periods (St ≈ 0.166 → period ≈ 96 t-units).
    emit_if_new(100, 128, D=16.0, n_warmup=6400, n_record=1600)
    # grid refinement at Re 100 (same t* budget, dt by CFL at nu = 0.32)
    emit_if_new(100, 256, D=32.0, n_warmup=15360, n_record=2400, dt=0.25)
    if _os.environ.get("CINDM_ANCHOR_SATURATE") == "1":
        # shedding SATURATION: warm to t* = 300 so cl_rms can be quoted
        # against the published saturated Cl_rms ~ 0.23, record ~10 periods
        emit_if_new(100, 128, D=16.0, n_warmup=16000, n_record=3200)
