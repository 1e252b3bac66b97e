"""Orbax checkpointing of train state.

TPU-native replacement for the reference's torch `.pt` milestone dicts
{step, model, opt, ema, scaler} (`model/diffusion_1d.py:2635-2667`,
`model/diffusion_2d.py:1199-1211`): the full TrainState pytree
{params, ema_params, opt_state, step} is saved with orbax, milestone-numbered
like the reference's ``model-{k}.pt``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _seed_schedule_counts(state: Any) -> Any:
    """Align LR-schedule counters with the restored global step.

    npz snapshots carry no opt_state, so after an npz resume the fresh
    ``ScaleByScheduleState.count`` would restart the reference
    StepLR(600k, 40k) schedule from 0 — a resumed >600k run would silently
    train at full LR. Adam moments stay fresh (their count=0 warm-up is the
    correct behavior for zeroed moments).
    """
    import jax.numpy as jnp
    import optax

    if not isinstance(state, dict) or "opt_state" not in state or "step" not in state:
        return state
    step = state["step"]

    def fix(s):
        if isinstance(s, optax.ScaleByScheduleState):
            return s._replace(count=jnp.asarray(step, s.count.dtype))
        return s

    state = dict(state)
    state["opt_state"] = jax.tree.map(
        fix,
        state["opt_state"],
        is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState),
    )
    return state


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, milestone: int, state: Any) -> None:
        self._mngr.save(milestone, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def load(self, milestone: Optional[int] = None, template: Any = None) -> Any:
        """Restore the given milestone (latest if None). ``template`` is an
        abstract pytree with the right structure/shapes (e.g. a freshly
        initialized state).

        Falls back to a git-committed ``persisted_m*.npz`` snapshot
        (params/ema_params/step only; see utils/persist.py) when the exact
        orbax milestone is absent — checkpoints survive VM wipes that way.
        """
        step = milestone if milestone is not None else self._mngr.latest_step()
        have_orbax = step is not None and (
            milestone is None or step in self.all_milestones()
        )
        if not have_orbax:
            from ..utils.persist import find_persisted, load_npz

            npz = find_persisted(self.directory, milestone)
            if npz is not None and template is not None:
                return _seed_schedule_counts(load_npz(npz, template))
            want = "latest" if milestone is None else f"milestone {milestone}"
            hint = (
                f"; a persisted snapshot exists ({npz}) but restoring it "
                f"requires template=" if npz is not None else ""
            )
            raise FileNotFoundError(
                f"no orbax checkpoint for {want} in {self.directory}{hint}"
            )
        if template is not None:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
            return self._mngr.restore(step, args=ocp.args.StandardRestore(target))
        return self._mngr.restore(step)

    def all_milestones(self):
        return list(self._mngr.all_steps())

    def latest_milestone(self) -> Optional[int]:
        step = self._mngr.latest_step()
        if step is None:
            from ..utils.persist import _PERSIST_RE, find_persisted

            npz = find_persisted(self.directory)
            if npz is not None:
                return int(_PERSIST_RE.search(npz).group(1))
        return step
