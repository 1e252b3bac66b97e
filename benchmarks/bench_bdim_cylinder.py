"""Quantitative anchor for the BDIM solver: impulsively-started cylinder.

Anchors `physics/bdim.py` to published values the way LilyPad itself is
validated (Maertens & Weymouth 2015; LilyPad's canonical circle demo,
`lily-pad/LilyPad/LilyPad.pde` default setup):

1. Mean drag coefficient Cd = Fx / (0.5 rho U^2 D) of a circular cylinder
   in the sub-critical plateau (experiment + LES/DNS across Re ~ 3e2-1e5:
   Cd ~ 1.0-1.5; LilyPad's own demo reports Cd ~ 1.3 at 64 cells/D).
2. Strouhal number St = f D / U of the vortex-shedding lift oscillation
   (published sub-critical band St ~ 0.18-0.21).
3. Grid convergence: Cd at n = {64, 128, 256} with fixed D/L ratio.

Run: JAX_PLATFORMS=cpu python benchmarks/bench_bdim_cylinder.py
"""

from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from cindm_tpu.physics.bdim import BDIMConfig, ellipse_coords, simulate_flow


def cylinder_run(n: int, d_frac: float = 0.25, n_warmup: int = 300, n_record: int = 400):
    """Simulate a cylinder of diameter d_frac*n centred at (n/3, n/2).

    Mirrors LilyPad's canonical circle test (circle of diameter n/4 at
    x = n/3). Returns dict of Cd statistics and Strouhal number.
    """
    cfg = BDIMConfig(n=n, cg_iters=100)
    D = d_frac * n
    # centre slightly off the grid symmetry line to seed the shedding
    # instability (LilyPad's discrete geometry does the same implicitly)
    # h = FULL height (diameter), matching reference CircleBody(d)
    # (`Body.pde:397-421`); D/2 here would halve the body.
    coords = ellipse_coords(n / 3.0 + 1.0, n / 2.0 + 0.37, D, 1.0, m=64)
    # CCW orientation so press_force's (ty, -tx) normal points INTO the
    # body and the integral is the force ON it (ellipse_coords builds CW);
    # the reference scores |drag|/|lift| so only interpretability changes.
    x, y = coords[:, 0], coords[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        coords = coords[::-1].copy()
    coords = jnp.asarray(coords)
    _, forces = simulate_flow(cfg, coords, n_warmup, n_record)
    forces = np.asarray(forces)[:, 0]  # [T, 2]
    q = 0.5 * cfg.u_inf**2 * D  # rho = 1
    cd = forces[:, 0] / q
    cl = forces[:, 1] / q
    # Strouhal from the dominant lift-oscillation frequency
    cl_d = cl - cl.mean()
    spec = np.abs(np.fft.rfft(cl_d * np.hanning(len(cl_d))))
    freqs = np.fft.rfftfreq(len(cl_d), d=cfg.dt)
    f_shed = float(freqs[1:][np.argmax(spec[1:])])
    return {
        "n": n,
        "D": D,
        "cd_mean": float(cd.mean()),
        "cd_std": float(cd.std()),
        "cl_rms": float(np.sqrt((cl_d**2).mean())),
        "strouhal": f_shed * D / cfg.u_inf,
        "cd_last100_mean": float(cd[-100:].mean()),
    }


if __name__ == "__main__":
    for n in (64, 128, 256):
        out = cylinder_run(n)
        print(json.dumps(out), flush=True)
