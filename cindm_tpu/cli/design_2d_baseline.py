"""design_2d_baseline — GD / CEM airfoil design over FNO / LE-PDE surrogates.

Mirrors the reference 2D baseline scripts
(`inference/baseline/inverse_design_{GD,CEM}_discrete_{fno,lepde}[_twobds].py`,
SURVEY.md §2.3 E6): optimize boundary (mask, offset) — and implicitly the
flow — by rolling the surrogate forward and scoring per-frame lift/drag with
ForceUnet; objective λ·|ΣFx| − ΣFy (`inverse_design_GD_discrete_fno.py:305-420`).
GD = Adam(1e-4) for optim_iter steps as a lax.scan; CEM = population search
over the boundary parameters.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="2D baseline design (GD/CEM over surrogates)")
    p.add_argument("--design_method", default="GD", choices=["GD", "CEM"])
    p.add_argument("--surrogate", default="fno", choices=["fno", "lepde"])
    p.add_argument("--surrogate_path", default=None)
    p.add_argument("--force_model_path", default=None)
    p.add_argument("--num_boundaries", type=int, default=1)
    p.add_argument("--optim_iter", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--rollout", type=int, default=4)
    p.add_argument("--lambda_force", type=float, default=1.0)
    p.add_argument("--N", type=int, default=128, help="CEM population")
    p.add_argument("--Ne", type=int, default=16, help="CEM elites")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--p_min", type=float, default=-1.0)
    p.add_argument("--p_max", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    import optax

    from ..baselines import FNO2d, LEPDE, LEPDEConfig
    from ..models.unet2d import ForceUnet
    from ..sampling.guidance2d import unnormalize_state
    from ..train import CheckpointManager, TrainConfig, init_train_state, make_optimizer
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    key = jax.random.PRNGKey(args.seed)

    # surrogate: u_{t+1} = f(u_t, static) on 64² grids (3 state + 3 static ch)
    if args.surrogate == "fno":
        smodel = FNO2d(out_channels=3, modes=12, width=32)
        sparams = smodel.init(key, jnp.zeros((1, 64, 64, 6)))
        step_fn = lambda p, u, static: smodel.apply(p, jnp.concatenate([u, static], -1))
    else:
        smodel = LEPDE(LEPDEConfig(), out_hw=64)
        sparams = smodel.init(key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), 1)
        step_fn = lambda p, u, static: smodel.apply(p, u, static, 1)[:, 0]
    if args.surrogate_path:
        mngr = CheckpointManager(args.surrogate_path)
        sparams = mngr.load(template=init_train_state(sparams, make_optimizer(TrainConfig())))["params"]

    fmodel = ForceUnet(dim=32, dim_mults=(1, 2))
    fparams = fmodel.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 4)))
    if args.force_model_path:
        fmngr = CheckpointManager(args.force_model_path)
        fparams = fmngr.load(
            template=init_train_state(fparams, make_optimizer(TrainConfig()))
        )["ema_params"]

    B = args.batch_size

    def objective(design, u0):
        """design: {'mask': [B,64,64,1], 'offset': [B,64,64,2]}; roll the
        surrogate, score λ|ΣFx| − ΣFy over frames (reference objective)."""
        static = jnp.concatenate(
            [jnp.clip(design["mask"], 0, 1), jnp.clip(design["offset"], -0.5, 0.5)], -1
        )
        u = u0
        fx = fy = 0.0
        for _ in range(args.rollout):
            u = step_fn(sparams, u, static)
            press = unnormalize_state(u[..., 2:3], args.p_min, args.p_max)
            ld = fmodel.apply(fparams, jnp.concatenate([press, static], -1))
            fx = fx + jnp.sum(ld[:, 0])
            fy = fy + jnp.sum(ld[:, 1])
        return args.lambda_force * jnp.abs(fx) - fy

    k1, k2, k3 = jax.random.split(key, 3)
    u0 = jax.random.normal(k1, (B, 64, 64, 3)) * 0.1
    design0 = {
        "mask": jax.nn.sigmoid(jax.random.normal(k2, (B, 64, 64, 1))),
        "offset": jax.random.normal(k3, (B, 64, 64, 2)) * 0.1,
    }

    if args.design_method == "GD":
        tx = optax.adam(args.lr)
        opt_state = tx.init(design0)

        @jax.jit
        def gd_step(design, opt_state):
            val, g = jax.value_and_grad(objective)(design, u0)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(design, updates), opt_state, val

        design = design0
        vals = []
        for i in range(args.optim_iter):
            design, opt_state, val = gd_step(design, opt_state)
            vals.append(float(val))
        record = {"design_method": "GD", "surrogate": args.surrogate,
                  "obj_first": vals[0], "obj_last": vals[-1]}
    else:
        from ..baselines import CEMConfig, cem_design

        flat0 = jnp.concatenate(
            [design0["mask"].reshape(B, -1), design0["offset"].reshape(B, -1)], -1
        )

        def unflatten(flat):
            m = flat[..., : 64 * 64].reshape(B, 64, 64, 1)
            o = flat[..., 64 * 64 :].reshape(B, 64, 64, 2)
            return {"mask": m, "offset": o}

        cfg = CEMConfig(n_samples=args.N, n_elites=args.Ne, n_iterations=args.optim_iter)
        best, obj = cem_design(
            cfg,
            rollout_fn=lambda f: f,
            design_fn=lambda f: objective(unflatten(f), u0),
            cond_shape=flat0.shape,
            key=key,
            clamp_fn=lambda f: f,
        )
        record = {"design_method": "CEM", "surrogate": args.surrogate,
                  "obj_last": float(obj)}

    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
