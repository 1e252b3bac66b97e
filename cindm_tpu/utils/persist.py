"""Git-committable checkpoint snapshots.

Round-3 lesson: `results/` (orbax checkpoints) is gitignored and the VM is
wiped between build sessions — round 3 lost every trained model from round 2
(the reference has no such problem because its torch ``.pt`` milestones are
tiny and kept next to the repo, `model/diffusion_1d.py:2635-2647`).

This module persists the *inference-critical* subtree of a TrainState —
``{params, ema_params, step}`` — as one compressed ``.npz`` keyed by pytree
key-path, small enough to commit (≈80–160 MB for the 20.8M-param flagship vs
≈330 MB for the full orbax state with Adam moments). Restoring fills those
leaves into a freshly initialized state template; the optimizer state stays
fresh (fine for inference, acceptable for fine-tune resume).

`CheckpointManager.load` falls back to the newest ``persisted_m*.npz`` in the
checkpoint directory when no orbax milestone exists, so every CLI
(`design_1d --model_path ...`, `train_1d --resume True`) transparently picks
up a committed snapshot on a fresh VM.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import numpy as np

_PERSIST_RE = re.compile(r"persisted_m(\d+)\.npz$")


def _flat_with_keys(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(kp), v) for kp, v in flat], treedef


def save_npz(state: Any, path: str) -> str:
    """Write {params, ema_params, step} of ``state`` to ``path`` (.npz)."""
    sub = {k: state[k] for k in ("params", "ema_params", "step") if k in state}
    flat, _ = _flat_with_keys(sub)
    arrs = {k: np.asarray(v) for k, v in flat}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, **arrs)
    os.replace(tmp, path)
    return path


def load_npz(path: str, template: Any) -> Any:
    """Restore a snapshot into ``template`` (a full fresh TrainState).

    Leaves present in the file (params/ema_params/step) are replaced; all
    others (opt_state) keep the template's freshly initialized values.
    """
    with np.load(path) as data:
        keys = set(data.files)
        flat, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        hit = 0
        for kp, v in flat:
            k = jax.tree_util.keystr(kp)
            if k in keys:
                leaves.append(jax.numpy.asarray(data[k]))
                hit += 1
            else:
                leaves.append(v)
    if hit == 0:
        raise ValueError(
            f"{path}: no key-path overlap with the provided template "
            f"(file keys like {sorted(keys)[:3]})"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def find_persisted(directory: str, milestone: Optional[int] = None) -> Optional[str]:
    """Newest (or exact-milestone) persisted_m*.npz under ``directory``."""
    cands = []
    for p in glob.glob(os.path.join(directory, "persisted_m*.npz")):
        m = _PERSIST_RE.search(os.path.basename(p))
        if m:
            cands.append((int(m.group(1)), p))
    if milestone is not None:
        for s, p in cands:
            if s == milestone:
                return p
        return None
    return max(cands)[1] if cands else None
