"""2D design evaluation: closed-loop BDIM scoring + lift/drag metrics.

Re-designs the reference evaluation pipeline
(`inference/evaluation_2d/evaluation_2d_design.py:54-103` + the
file-based LilyPad handoff, SURVEY.md §1): instead of writing boundary
`.txt` files for a Java process and parsing force `.txt` files back, the
designed boundaries are re-simulated by the on-device BDIM solver and the
same metrics are computed:

    obj  = −|lift| + λ·|drag|        (minimize)
    frac = |lift / drag|             (maximize)

averaged over the recorded steps, best over the batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..physics.bdim import BDIMConfig, simulate_flow_batch


def metric(lift, drag, lam: float = 1.0, use_frac: bool = False):
    """`evaluation_2d_design.py:54-58`."""
    lift = jnp.asarray(lift)
    drag = jnp.asarray(drag)
    if use_frac:
        return jnp.abs(lift / drag)
    return -jnp.abs(lift) + lam * jnp.abs(drag)


def metric_batch(forces: np.ndarray, lam: float = 1.0):
    """`evaluation_2d_design.py:60-78`. forces: [B, T, K, 2] (drag, lift).

    Returns (drag_min, lift_max, obj_min, lift_over_drag_max) over the batch.
    """
    drag = forces[..., 0].sum(axis=2)  # [B, T]
    lift = forces[..., 1].sum(axis=2)
    drag_mean = drag.mean(axis=1)
    lift_mean = lift.mean(axis=1)
    obj = np.asarray(metric(lift, drag, lam)).mean(axis=1)
    frac = np.asarray(metric(lift, drag, lam, use_frac=True)).mean(axis=1)
    return (
        float(np.min(np.abs(drag_mean))),
        float(np.max(np.abs(lift_mean))),
        float(np.min(np.abs(obj))),
        float(np.max(np.abs(frac))),
    )


def evaluate_designs(
    boundaries: np.ndarray,
    bdim_cfg: Optional[BDIMConfig] = None,
    n_warmup: int = 300,
    n_record: int = 100,
    lam: float = 1.0,
):
    """Closed-loop scoring: re-simulate designed boundary polygons with BDIM
    and compute the reference metrics (replaces the LilyPad t=300..400 run,
    `LilyPad.pde:143-180` + `evaluation_2d_design.py`).

    Args:
        boundaries: [B, K, M, 2] polygons in grid units.

    Returns:
        dict with forces [B, T, K, 2] and the four batch metrics.
    """
    cfg = bdim_cfg or BDIMConfig()
    _, forces = simulate_flow_batch(cfg, jnp.asarray(boundaries), n_warmup, n_record)
    forces = np.asarray(forces)
    drag_min, lift_max, obj_min, frac_max = metric_batch(forces, lam)
    return {
        "forces": forces,
        "drag_min": drag_min,
        "lift_max": lift_max,
        "obj_min": obj_min,
        "lift_over_drag_max": frac_max,
    }
