"""design_1d — compositional guided inverse design CLI (the flagship).

Mirrors `inference/inverse_design_diffusion_1d.py:52-103` flags: loads a
trained diffusion checkpoint, runs guided (optionally composed) sampling
toward the target point, re-simulates the designed initial state on-device,
and reports design_obj / MAE / RMSE with 95% CIs
(`inverse_design_diffusion_1d.py:303-398`).
"""

from __future__ import annotations

import argparse
import os
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Compositional inverse design (1D)")
    p.add_argument("--dataset", default="nbody-2")
    p.add_argument("--model_path", default="./results/nbody")
    p.add_argument("--milestone", type=int, default=None)
    p.add_argument("--conditioned_steps", type=int, default=0)
    p.add_argument("--rollout_steps", type=int, default=24)
    p.add_argument("--Unet_dim", type=int, default=64)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--sample_steps", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--design_guidance", default="standard-recurrence-10")
    p.add_argument("--design_coef", type=float, default=0.2)  # scripts_paper/1D/cindm.sh
    p.add_argument("--consistency_coef", type=float, default=0.2)
    p.add_argument("--design_fn_mode", default="L2")
    p.add_argument("--normalize_grad_per_body", action="store_true",
                   help="scale the design objective by 2/compose_n_bodies so "
                        "the per-body guidance gradient accumulated across "
                        "overlapping pair windows matches the 2-body tuning "
                        "(RESULTS.md round-3 hypothesis)")
    p.add_argument("--compose_n_bodies", type=int, default=2)
    p.add_argument("--n_composed", type=int, default=0)
    p.add_argument("--compose_mode", default="mean-inside")
    p.add_argument("--compose_start_step", type=int, default=4)
    p.add_argument("--target", type=float, nargs=2, default=[0.5, 0.5])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fold_chunks", type=int, default=1,
                   help="split the folded (window, pair, batch) axis into "
                        "this many sequential denoiser calls per step "
                        "(bounds the working set at large batch)")
    p.add_argument("--host_chunks", type=int, default=10,
                   help="split the reverse loop into N device launches (same numerics)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="shard the candidate-design batch over a data mesh "
                        "of this many chips (batch-sharded sampling, "
                        "SURVEY.md §2.6; 0 = single device)")
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..core import make_schedule
    from ..models import TemporalUnet1D
    from ..physics import eval_simu
    from ..sampling import (
        Diffusion1DConfig,
        confidence_interval_95,
        get_design_fn,
        get_eval_fn,
        get_eval_fn_per_sample,
        sample,
    )
    from ..train import CheckpointManager, TrainConfig, init_train_state, make_optimizer

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    model_n_bodies = int(args.dataset.split("-")[1])
    feat = model_n_bodies * 4
    horizon = args.conditioned_steps + args.rollout_steps

    model = TemporalUnet1D(
        horizon=horizon, transition_dim=feat, dim=args.Unet_dim, attention=True
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, horizon, feat)), jnp.zeros(1, jnp.int32)
    )
    mngr = CheckpointManager(args.model_path)
    template = init_train_state(params, make_optimizer(TrainConfig()))
    state = mngr.load(args.milestone, template=template)
    params = state["ema_params"]

    dcfg = Diffusion1DConfig(
        rollout_steps=args.rollout_steps,
        conditioned_steps=args.conditioned_steps,
        timesteps=args.timesteps,
    )
    sched = make_schedule(args.timesteps)

    target = jnp.asarray(args.target)
    norm_factor = (
        2.0 / args.compose_n_bodies if args.normalize_grad_per_body else 1.0
    )
    design_fn = get_design_fn(
        target, last_n_step=1, coef=args.design_coef,
        time_consistency_coef=args.consistency_coef, design_fn_mode=args.design_fn_mode,
        norm_factor=norm_factor,
    )
    eval_fn = get_eval_fn(target, last_n_step=1)
    eval_each = get_eval_fn_per_sample(target, last_n_step=1)

    if os.environ.get("CINDM_FUSED_RTB") == "1":
        # measured-winner RTB blocks through the Pallas megakernel; grads
        # flow through a reference-path VJP (ops/fused_rtb.py)
        from ..models.fused_apply import temporal_unet1d_fused_apply

        eps = lambda x, t: temporal_unet1d_fused_apply(model, params, x, t)
    else:
        eps = lambda x, t: model.apply(params, x, t)
    total_feat = args.compose_n_bodies * 4
    init_img = None
    if args.n_devices > 0:
        # batch-sharded sampling: seed the reverse loop with an x_T whose
        # batch axis is sharded over the 'data' mesh; guided diffusion has
        # no cross-sample communication, so placement propagates through
        # the (chunked) scans and each chip denoises its shard.
        from ..parallel import make_mesh, shard_design_batch
        from ..sampling import sample_total_steps

        mesh = make_mesh(args.n_devices, ("data",))
        if args.batch_size % args.n_devices:
            raise SystemExit("--batch_size must be a multiple of --n_devices")
        total_steps = sample_total_steps(
            dcfg, args.n_composed, args.compose_start_step, args.compose_n_bodies
        )
        key0 = jax.random.PRNGKey(args.seed + 1)
        init_img = shard_design_batch(
            mesh, jax.random.normal(key0, (args.batch_size, total_steps, total_feat))
        )
    out = sample(
        dcfg, sched, eps, jax.random.PRNGKey(args.seed),
        batch_size=args.batch_size, feature_size=total_feat,
        init_img=init_img,
        design_fn=design_fn, design_guidance=args.design_guidance,
        n_composed=args.n_composed, compose_start_step=args.compose_start_step,
        compose_n_bodies=args.compose_n_bodies, compose_mode=args.compose_mode,
        sample_steps=args.sample_steps,
        host_chunks=args.host_chunks,
        fold_chunks=args.fold_chunks,
    )

    total_rollout = out.shape[1] - 1
    pred_simu, _ = eval_simu(
        out[:, :1], eval_fn, n_bodies=args.compose_n_bodies, rollout_steps=total_rollout
    )
    per_sample = eval_each(pred_simu)
    design_obj = float(jnp.mean(per_sample))
    ci = float(confidence_interval_95(per_sample))
    mae = float(jnp.mean(jnp.abs(out[:, 1:] - pred_simu)))
    rmse = float(jnp.sqrt(jnp.mean(jnp.square(out[:, 1:] - pred_simu))))
    record = {
        "design_obj": design_obj,
        "design_obj_ci95": ci,
        "MAE": mae,
        "RMSE": rmse,
        "batch_size": args.batch_size,
        "design_guidance": args.design_guidance,
        "n_composed": args.n_composed,
        "compose_n_bodies": args.compose_n_bodies,
        "normalize_grad_per_body": bool(args.normalize_grad_per_body),
    }
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
