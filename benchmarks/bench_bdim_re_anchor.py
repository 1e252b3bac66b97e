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

import json

import jax.numpy as jnp
import numpy as np

from cindm_tpu.physics.bdim import BDIMConfig, ellipse_coords, simulate_flow


def ccw(coords: np.ndarray) -> np.ndarray:
    x, y = coords[:, 0], coords[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        coords = coords[::-1].copy()
    return coords


def run(re: float, n: int, D: float, n_warmup: int, n_record: int, dt: float = 0.4):
    cfg = BDIMConfig(n=n, dt=dt, nu=D / re, quick=True, cg_iters=120)
    cx, cy = n / 3.0 + 0.5, n / 2.0 + 0.37
    coords = ccw(ellipse_coords(cx, cy, D / 2.0, 1.0, m=64))
    (us, vs, ps), fs = simulate_flow(cfg, jnp.asarray(coords), n_warmup, n_record)
    f = np.asarray(fs)[:, 0]
    q = 0.5 * D
    cd = f[:, 0] / q
    cl = f[:, 1] / q
    cl_d = cl - cl.mean()
    spec = np.abs(np.fft.rfft(cl_d * np.hanning(len(cl_d))))
    freqs = np.fft.rfftfreq(len(cl_d), d=dt)
    st = float(freqs[1:][np.argmax(spec[1:])]) * D

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
        "cd_mean": float(cd.mean()),
        "cd_std": float(cd.std()),
        "cl_rms": float(np.sqrt((cl_d**2).mean())),
        "strouhal": st,
        "bubble_over_D": bubble,
        "t_end": (n_warmup + n_record) * dt,
    }


if __name__ == "__main__":
    # Re 40: steady by t*~30 → t=480; record average once settled
    print(json.dumps(run(40, 128, 16.0, n_warmup=1200, n_record=300)), flush=True)
    # Re 100: shedding saturates by t*~60 → t=960; record ~3 periods (t~290)
    print(json.dumps(run(100, 128, 16.0, n_warmup=2400, n_record=750)), flush=True)
    # grid refinement at Re 100
    print(json.dumps(run(100, 256, 32.0, n_warmup=4800, n_record=1500, dt=0.25)), flush=True)
