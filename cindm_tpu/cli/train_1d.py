"""train_1d — n-body diffusion / forward-model training CLI.

Mirrors `train/train_1d.py:23-81` flags (defaults likewise form a smoke
run: 6 steps, save every 2 — SURVEY.md §4). method_type supports the same
families: Diffusion, forward_model (Unet1D_forward_model), GNS.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train n-body models (TPU)")
    p.add_argument("--dataset", default="nbody-2")
    p.add_argument("--n_bodies", type=int, default=2)
    p.add_argument("--conditioned_steps", type=int, default=0)
    p.add_argument("--rollout_steps", type=int, default=24)
    p.add_argument("--time_interval", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--Unet_dim", type=int, default=64)
    p.add_argument("--method_type", default="Diffusion",
                   choices=["Diffusion", "forward_model", "GNS"])
    p.add_argument("--train_num_steps", type=int, default=6)
    p.add_argument("--save_and_sample_every", type=int, default=2)
    p.add_argument("--loss_weight_discount", type=float, default=0.95)
    p.add_argument("--beta_schedule", default="cosine")
    p.add_argument("--loss_type", default="l1")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--n_sims", type=int, default=64, help="simulations to generate")
    p.add_argument("--dataset_path", default="./dataset/nbody_dataset")
    p.add_argument("--results_folder", default="./results/nbody")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gradient_accumulate_every", type=int, default=2)
    p.add_argument("--is_testdata", type=lambda s: s == "True", default=True)
    p.add_argument("--resume", type=lambda s: s == "True", default=False,
                   help="resume from the latest milestone in results_folder "
                        "(Trainer1D.load semantics, model/diffusion_1d.py:2649-2667)")
    return p


def main(argv=None):
    from ..core import make_schedule
    from ..data.nbody import NBodyDataset, NBodyDatasetConfig
    from ..models import TemporalUnet1D
    from ..sampling import Diffusion1DConfig
    from ..train import (
        CheckpointManager,
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
        make_train_step_from_loss,
    )

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    n_bodies = int(args.dataset.split("-")[1]) if "-" in args.dataset else args.n_bodies
    feat = n_bodies * 4

    ds = NBodyDataset(
        NBodyDatasetConfig(
            n_bodies=n_bodies,
            input_steps=args.conditioned_steps,
            output_steps=args.rollout_steps,
            time_interval=args.time_interval,
        ),
        n_sims=args.n_sims,
        seed=args.seed,
        cache_path=os.path.join(
            args.dataset_path, f"nbody-{n_bodies}", f"traj_{args.n_sims}.npy"
        ),
    )

    horizon = args.conditioned_steps + args.rollout_steps
    sched = make_schedule(args.timesteps, args.beta_schedule)
    dcfg = Diffusion1DConfig(
        rollout_steps=args.rollout_steps,
        conditioned_steps=args.conditioned_steps,
        timesteps=args.timesteps,
        loss_type=args.loss_type,
        beta_schedule=args.beta_schedule,
        loss_weight_discount=args.loss_weight_discount,
    )
    tcfg = TrainConfig(gradient_accumulate_every=args.gradient_accumulate_every)

    key = jax.random.PRNGKey(args.seed)
    if args.method_type == "Diffusion":
        model = TemporalUnet1D(
            horizon=horizon, transition_dim=feat, dim=args.Unet_dim, attention=True
        )
        params = model.init(key, jnp.zeros((1, horizon, feat)), jnp.zeros(1, jnp.int32))
        step = make_train_step(model.apply, dcfg, sched, tcfg)
    elif args.method_type == "forward_model":
        from ..baselines import Unet1DForwardModel

        model = Unet1DForwardModel(
            horizon=horizon, transition_dim=feat, dim=args.Unet_dim
        )
        params = model.init(key, jnp.zeros((1, 1, feat)))

        def loss_fn(params, batch, key):
            cond = batch["x"][:, :1]
            noise = jax.random.normal(key, batch["x"].shape, batch["x"].dtype)
            pred = model.apply(params, cond, noise)
            return jnp.mean(jnp.abs(pred - batch["x"]))

        step = make_train_step_from_loss(loss_fn, tcfg)
    elif args.method_type == "GNS":
        from ..baselines import GNSConfig, GNSNet

        gcfg = GNSConfig()
        model = GNSNet(gcfg)
        poss0 = jnp.zeros((1, n_bodies, gcfg.n_his, 2))
        ptype = jnp.zeros((1, n_bodies), jnp.int32)
        params = model.init(key, poss0, ptype)

        def loss_fn(params, batch, key):
            # batch x: [B, T, n*4] normalized; histories of n_his positions
            x = batch["x"].reshape(batch["x"].shape[0], -1, n_bodies, 4)
            poss = jnp.transpose(x[..., :2], (0, 2, 1, 3))  # [B, n, T, 2]
            hist = poss[:, :, : gcfg.n_his]
            tgt = poss[:, :, gcfg.n_his]
            pt = jnp.zeros(hist.shape[:2], jnp.int32)
            acc = model.apply(params, hist, pt)
            vel = hist[:, :, -1] - hist[:, :, -2]
            pred = hist[:, :, -1] + vel + acc
            return jnp.mean(jnp.square(pred - tgt))

        step = make_train_step_from_loss(loss_fn, tcfg)
    else:
        raise ValueError(args.method_type)

    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"Number of parameter: {n_params/1e6:.2f}M")

    state = init_train_state(params, make_optimizer(tcfg))
    mngr = CheckpointManager(args.results_folder)
    start = 0
    if args.resume and mngr.latest_milestone() is not None:
        state = mngr.load(template=state)
        start = int(state["step"])
        print(f"resumed from step {start} (milestone {mngr.latest_milestone()})")
    it = ds.iterate_batches(args.batch_size, seed=args.seed)
    for i in range(start, args.train_num_steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, loss = step(state, batch, jax.random.fold_in(key, i))
        loss_f = float(loss)
        if not np.isfinite(loss_f):
            # NaN guard: stop before poisoning checkpoints (the reference
            # rolls back to the last good checkpoint,
            # inference_1d_composing_time_steps.py:141-149)
            raise FloatingPointError(f"non-finite loss at step {i+1}: {loss_f}")
        if (i + 1) % args.save_and_sample_every == 0:
            # milestone id = global step: monotonic across resumed runs with
            # different save intervals, so "latest" is always the newest
            mngr.save(i + 1, state)
            print(f"step {i+1}: loss {loss_f:.6f} (saved milestone {i+1})")
        else:
            print(f"step {i+1}: loss {loss_f:.6f}")
    return state


if __name__ == "__main__":
    main()
