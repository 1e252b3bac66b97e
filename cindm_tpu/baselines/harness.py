"""Shared surrogate-training harness pieces mirroring the le_pde flag
semantics (`le_pde/argparser.py`, `le_pde/utils.py`) that the paper's
baseline recipes actually exercise (SURVEY.md §2.4 B4):

- ``parse_multi_step``: the reference's weighted multi-step loss spec
  (`le_pde/utils.py:713-731`): "1^2:1e-2^4:1e-3" → {1: 1.0, 2: 1e-2,
  4: 1e-3}; a bare "k" entry gets weight 1.
- ``loss_core``: "mse" | "l1" | "huber" elementwise losses
  (`le_pde/utils.py:410` loss_op_core).
- ``multi_step_loss``: autoregressive rollout to max(step) with the
  per-step weights applied only at the listed steps
  (`le_pde/utils.py:216-235` get_loss; the rollout itself is the shared
  `get_data_next_step` stepper semantics, `le_pde/utils.py:137`).
- ``experiment_record``: hash-named JSON experiment records, the
  pytorch_net ``record_data``/``pdump`` pattern
  (`train/train_baseline.py:273-295`).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable

import jax.numpy as jnp


def parse_multi_step(spec: str) -> dict[int, float]:
    """"1^2:1e-2^4:1e-3" → {1: 1.0, 2: 0.01, 4: 0.001} (`le_pde/utils.py:713`)."""
    out: dict[int, float] = {}
    for part in str(spec).split("^"):
        if not part:
            continue
        if ":" in part:
            k, w = part.split(":")
            out[int(k)] = float(w)
        else:
            out[int(part)] = 1.0
    if not out:
        raise ValueError(f"empty multi_step spec {spec!r}")
    return out


def loss_core(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str) -> jnp.ndarray:
    """Elementwise-mean loss (`le_pde/utils.py:410` loss_op_core subset)."""
    diff = pred - target
    if loss_type == "mse":
        return jnp.mean(jnp.square(diff))
    if loss_type == "l1":
        return jnp.mean(jnp.abs(diff))
    if loss_type == "huber":
        a = jnp.abs(diff)
        return jnp.mean(jnp.where(a < 1.0, 0.5 * jnp.square(diff), a - 0.5))
    raise ValueError(f"unknown loss_type {loss_type!r}")


def multi_step_loss(
    step_fn: Callable[[jnp.ndarray], jnp.ndarray],
    u0: jnp.ndarray,
    targets: jnp.ndarray,  # [B, K, ...] with K >= max(multi_step_dict)
    multi_step_dict: dict[int, float],
    loss_type: str = "mse",
) -> jnp.ndarray:
    """Weighted autoregressive multi-step loss (`le_pde/utils.py:222-235`):
    roll ``step_fn`` to max(step); add weight·loss only at listed steps."""
    max_step = max(multi_step_dict)
    loss = jnp.asarray(0.0)
    cur = u0
    for i in range(1, max_step + 1):
        cur = step_fn(cur)
        if i in multi_step_dict:
            loss = loss + multi_step_dict[i] * loss_core(
                cur, targets[:, i - 1], loss_type
            )
    return loss / sum(multi_step_dict.values())


def experiment_record(results_folder: str, args_dict: dict, history: list[dict],
                      final: dict) -> str:
    """Write a hash-named JSON experiment record (the pytorch_net
    pdump/record_data pattern, `train/train_baseline.py:273-295`):
    {args, per-epoch history, final metrics}. Returns the path."""
    payload = {"args": args_dict, "history": history, "final": final,
               "time": time.strftime("%Y-%m-%d %H:%M:%S")}
    h = hashlib.sha1(
        json.dumps(args_dict, sort_keys=True).encode()
    ).hexdigest()[:10]
    os.makedirs(results_folder, exist_ok=True)
    path = os.path.join(results_folder, f"record_{h}.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path
