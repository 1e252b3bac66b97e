"""Quantitative anchors for the BDIM solver.

The round-1 BDIM tests were qualitative (finiteness, interior velocity,
divergence). These anchor the solver to closed-form physics:

1. Impulsively-started cylinder ≈ potential flow at t→0⁺: after the first
   projection the velocity field outside the smoothing kernel must match
   u_r = U(1−R²/r²)cosθ, u_θ = −U(1+R²/r²)sinθ to within the finite-domain
   blockage error (measured 6.6% rel-L2 at n=96, D/L=1/6). This exercises
   the BDIM forcing, the variable-coefficient Poisson projection, and the
   staggered-grid layout end-to-end.
2. The QUICK+viscous branch (`BDIM.pde` QUICK paths) preserves uniform flow
   exactly and produces the canonical bluff-body pressure signature
   (stagnation front, suction rear) — with physical drag sign after
   orientation normalization.

The finite-Re cylinder drag/Strouhal anchor against published values runs
in `benchmarks/bench_bdim_cylinder.py` (hours-long; results in RESULTS.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cindm_tpu.physics.bdim import (
    BDIMConfig,
    BDIMState,
    bdim_step,
    divergence,
    ellipse_coords,
    init_state,
    make_consts,
    press_force,
    simulate_flow,
)


def _potential_uv(x, y, cx, cy, R):
    dx, dy = x - cx, y - cy
    r2 = dx**2 + dy**2
    u = 1.0 - R**2 * (dx**2 - dy**2) / r2**2
    v = -R**2 * 2 * dx * dy / r2**2
    return u, v


@pytest.mark.slow
def test_impulsive_start_matches_potential_flow():
    n, R = 96, 8.0
    cfg = BDIMConfig(n=n, dt=0.2, cg_iters=200)
    cx, cy = n / 2 + 0.5, n / 2 + 0.37
    coords = jnp.asarray(ellipse_coords(cx, cy, R, 1.0, m=96))
    consts = make_consts(cfg, coords)
    s = init_state(cfg)
    for _ in range(2):
        s = bdim_step(cfg, consts, s)

    N = cfg.N
    u, v = np.asarray(s.u), np.asarray(s.v)
    iu, ju = np.meshgrid(np.arange(N) - 0.5, np.arange(N), indexing="ij")
    iv, jv = np.meshgrid(np.arange(N).astype(float), np.arange(N) - 0.5, indexing="ij")
    pu, _ = _potential_uv(iu, ju, cx, cy, R)
    _, pv = _potential_uv(iv, jv, cx, cy, R)
    ru = np.sqrt((iu - cx) ** 2 + (ju - cy) ** 2)
    rv = np.sqrt((iv - cx) ** 2 + (jv - cy) ** 2)
    mu = (ru > R + 3 * cfg.eps) & (iu > 4) & (iu < N - 5) & (ju > 4) & (ju < N - 5)
    mv = (rv > R + 3 * cfg.eps) & (iv > 4) & (iv < N - 5) & (jv > 4) & (jv < N - 5)
    num = ((u - pu)[mu] ** 2).sum() + ((v - pv)[mv] ** 2).sum()
    den = (pu[mu] ** 2).sum() + (pv[mv] ** 2).sum()
    rel = float(np.sqrt(num / den))
    assert rel < 0.10, f"potential-flow rel L2 error {rel:.3f}"
    div = np.abs(np.asarray(divergence(s.u, s.v))[2:-2, 2:-2]).max()
    assert div < 1e-3


def test_quick_branch_preserves_uniform_flow():
    cfg = BDIMConfig(n=48, dt=0.5, nu=0.01, quick=True, cg_iters=50)
    coords = jnp.asarray(ellipse_coords(-100.0, -100.0, 5.0, 1.0, m=16))
    consts = make_consts(cfg, coords)
    s = init_state(cfg)
    for _ in range(3):
        s = bdim_step(cfg, consts, s)
    assert float(jnp.max(jnp.abs(s.u[1:-1, 1:-1] - 1.0))) < 1e-5
    assert float(jnp.max(jnp.abs(s.v[1:-1, 1:-1]))) < 1e-5


@pytest.mark.slow
def test_quick_cylinder_pressure_signature_and_drag_sign():
    cfg = BDIMConfig(n=64, dt=0.4, nu=16.0 / 1000.0, quick=True, cg_iters=80)
    coords = ellipse_coords(21.0, 32.4, 8.0, 1.0, m=64)
    # orientation-normalize: make the polygon CCW so press_force's
    # (nx, ny) = (ty, -tx) is the INWARD normal and ∮p n dl is the force on
    # the body (LilyPad/reference store the opposite ordering and score
    # |lift|, |drag| — `evaluation_2d_design.py:54-78`)
    x, y = coords[:, 0], coords[:, 1]
    if 0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0:
        coords = coords[::-1].copy()
    (us, vs, ps), fs = simulate_flow(cfg, jnp.asarray(coords), 50, 5)
    p = np.asarray(ps[-1])
    assert np.isfinite(np.asarray(us)).all()
    assert p[10, 31] > 0.1, "front stagnation pressure missing"
    assert p[30, 31] < -0.1, "rear suction missing"
    drag = float(np.asarray(fs)[-1, 0, 0])
    assert drag > 0.0, f"physical drag should be positive, got {drag}"
