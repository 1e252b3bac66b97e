"""train_1d — n-body diffusion / forward-model training CLI.

Mirrors `train/train_1d.py:23-81` flags (defaults likewise form a smoke
run: 6 steps, save every 2 — SURVEY.md §4). method_type supports the same
families as `Trainer1D` (`model/diffusion_1d.py:2770-2835`): Diffusion,
forward_model (Unet1D_forward_model), Unet_rollout_one (single-step
forward model trained through its own autoregressive rollout), GNS
(Net, real n_his history), GNS_cond_one (Net_cond_one, one (pos, vel)
frame), GNS_direct (Net_cond_one with output_size = 2·rollout).

TPU-native extras over the reference: `--n_devices` shards the train step
over a DP mesh (`jax.sharding.Mesh` + NamedSharding; XLA inserts the
gradient psum over ICI), and `--eval_every` runs the periodic EMA-sampling
eval + loss-curve dump the reference Trainer1D does at each save interval
(`model/diffusion_1d.py:2865-2990`).
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

METHOD_TYPES = [
    "Diffusion",
    "forward_model",
    "Unet_rollout_one",
    "GNS",
    "GNS_cond_one",
    "GNS_direct",
]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train n-body models (TPU)")
    p.add_argument("--dataset", default="nbody-2")
    p.add_argument("--n_bodies", type=int, default=2)
    p.add_argument("--conditioned_steps", type=int, default=0)
    p.add_argument("--rollout_steps", type=int, default=24)
    p.add_argument("--time_interval", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--Unet_dim", type=int, default=64)
    p.add_argument("--method_type", default="Diffusion", choices=METHOD_TYPES)
    p.add_argument("--train_num_steps", type=int, default=6)
    p.add_argument("--save_and_sample_every", type=int, default=2)
    p.add_argument("--loss_weight_discount", type=float, default=0.95)
    p.add_argument("--beta_schedule", default="cosine")
    p.add_argument("--loss_type", default="l1")
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--n_sims", type=int, default=64, help="simulations to generate")
    p.add_argument("--test_sims", type=int, default=0,
                   help="held-out sims for periodic eval (reference splits "
                        "5800/100 for 2-body, data/nbody_dataset.py:51-60)")
    p.add_argument("--dataset_path", default="./dataset/nbody_dataset")
    p.add_argument("--results_folder", default="./results/nbody")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="Adam lr (`model/diffusion_1d.py:2610`); the GNS "
                        "full-rollout loss trains more stably at ~3e-5")
    p.add_argument("--gradient_accumulate_every", type=int, default=2)
    p.add_argument("--collision_frac", type=float, default=0.0,
                   help="fraction of each batch drawn from collision-rich "
                        "windows (the reference's more_collision training "
                        "distribution, scripts_paper/1D/cindm.sh)")
    p.add_argument("--gns_noise_std", type=float, default=6.7e-7,
                   help="random-walk training noise (GNS_model/configs/Nbody.yaml:28)")
    p.add_argument("--steps_per_launch", type=int, default=1,
                   help="micro-steps fused into one device launch "
                        "(lax.scan); amortizes per-launch dispatch "
                        "overhead — essential on tunneled TPU backends")
    p.add_argument("--n_devices", type=int, default=0,
                   help="shard the train step over a DP mesh of this many "
                        "devices (0 = single device, no mesh)")
    p.add_argument("--eval_every", type=int, default=0,
                   help="run EMA-sampling eval every this many optimizer "
                        "steps (0 = off); Diffusion method only")
    p.add_argument("--eval_batch", type=int, default=64)
    p.add_argument("--eval_sample_steps", type=int, default=250)
    p.add_argument("--log_every", type=int, default=50,
                   help="loss print / NaN-check interval in optimizer steps")
    p.add_argument("--is_testdata", type=lambda s: s == "True", default=True)
    p.add_argument("--resume", type=lambda s: s == "True", default=False,
                   help="resume from the latest milestone in results_folder "
                        "(Trainer1D.load semantics, model/diffusion_1d.py:2649-2667)")
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
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
        sampling_eval_1d,
    )

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    n_bodies = int(args.dataset.split("-")[1]) if "-" in args.dataset else args.n_bodies
    feat = n_bodies * 4

    dcfg_data = NBodyDatasetConfig(
        n_bodies=n_bodies,
        input_steps=args.conditioned_steps,
        output_steps=args.rollout_steps,
        time_interval=args.time_interval,
    )
    ds = NBodyDataset(
        dcfg_data,
        n_sims=args.n_sims,
        seed=args.seed,
        cache_path=os.path.join(
            args.dataset_path, f"nbody-{n_bodies}", f"traj_{args.n_sims}.npy"
        ),
    )
    ds_test = None
    if args.test_sims > 0:
        # split by simulation like the reference (last k sims held out)
        ds_test = NBodyDataset(dcfg_data, data=ds.data[-args.test_sims:])
        ds = NBodyDataset(dcfg_data, data=ds.data[: -args.test_sims])

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
    tcfg = TrainConfig(lr=args.lr, gradient_accumulate_every=args.gradient_accumulate_every)
    spl = max(args.steps_per_launch, 1)
    if spl > 1 and spl % max(args.gradient_accumulate_every, 1):
        raise SystemExit("--steps_per_launch must be a multiple of "
                         "--gradient_accumulate_every")

    mesh = None
    if args.n_devices > 0:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices, ("data",))

    key = jax.random.PRNGKey(args.seed)
    model = None
    if args.method_type == "Diffusion":
        model = TemporalUnet1D(
            horizon=horizon, transition_dim=feat, dim=args.Unet_dim, attention=True
        )
        params = model.init(key, jnp.zeros((1, horizon, feat)), jnp.zeros(1, jnp.int32))
        step = make_train_step(model.apply, dcfg, sched, tcfg, mesh=mesh,
                               steps_per_launch=spl)
    elif args.method_type == "forward_model":
        from ..baselines import Unet1DForwardModel

        model = Unet1DForwardModel(horizon=horizon, transition_dim=feat, dim=args.Unet_dim)
        params = model.init(key, jnp.zeros((1, 1, feat)))

        def loss_fn(params, batch, key):
            # pred = model(cond), L1 vs the whole window
            # (`model/diffusion_1d.py:2771-2781`)
            cond = batch["x"][:, :1]
            noise = jax.random.normal(key, batch["x"].shape, batch["x"].dtype)
            pred = model.apply(params, cond, noise)
            return jnp.mean(jnp.abs(pred - batch["x"]))

        step = make_train_step_from_loss(loss_fn, tcfg, mesh=mesh,
                                         steps_per_launch=spl)
    elif args.method_type == "Unet_rollout_one":
        from ..baselines import Unet1DForwardModel

        # horizon = 1 + conditioned (reference builds 1+cond,
        # `train/train_1d.py:138-146`); trained through its own
        # autoregressive rollout (`model/diffusion_1d.py:2782-2797`)
        model = Unet1DForwardModel(horizon=2, transition_dim=feat, dim=args.Unet_dim)
        params = model.init(key, jnp.zeros((1, 1, feat)))

        def loss_fn(params, batch, key):
            x = batch["x"]  # [B, T, F]
            T = x.shape[1]

            def one(c, _):
                nxt = model.apply(params, c)[:, -1:]
                return nxt, nxt[:, 0]

            _, traj = jax.lax.scan(one, x[:, :1], None, length=T - 1)
            pred = jnp.transpose(traj, (1, 0, 2))
            return jnp.mean(jnp.abs(pred - x[:, 1:]))

        step = make_train_step_from_loss(loss_fn, tcfg, mesh=mesh,
                                         steps_per_launch=spl)
    elif args.method_type in ("GNS", "GNS_cond_one", "GNS_direct"):
        from ..baselines import GNSConfig, GNSNet, make_gns_loss

        if args.method_type == "GNS":
            gcfg = GNSConfig(n_his=4, out_size=2)
            mode = "autoregress"
        elif args.method_type == "GNS_cond_one":
            gcfg = GNSConfig(n_his=2, out_size=2)
            mode = "cond_one"
        else:  # GNS_direct: all rollout accelerations in one call
            gcfg = GNSConfig(n_his=2, out_size=2 * (horizon - 1))
            mode = "direct"
        model = GNSNet(gcfg)
        poss0 = jnp.zeros((1, n_bodies, gcfg.n_his, 2))
        ptype = jnp.zeros((1, n_bodies), jnp.int32)
        params = model.init(key, poss0, ptype)
        loss_fn = make_gns_loss(
            model.apply, gcfg, n_bodies, mode,
            time_interval=args.time_interval, noise_std=args.gns_noise_std,
        )
        step = make_train_step_from_loss(loss_fn, tcfg, mesh=mesh,
                                         steps_per_launch=spl)
    else:
        raise ValueError(args.method_type)

    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"Number of parameter: {n_params/1e6:.2f}M")

    state = init_train_state(params, make_optimizer(tcfg))
    if mesh is not None:
        from ..parallel.mesh import replicate

        state = replicate(mesh, state)
    mngr = CheckpointManager(args.results_folder)
    if args.resume and mngr.latest_milestone() is not None:
        state = mngr.load(template=state)
        if mesh is not None:
            from ..parallel.mesh import replicate

            state = replicate(mesh, state)
        print(f"resumed from step {int(state['step'])} "
              f"(milestone {mngr.latest_milestone()})")

    def shard(batch):
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from ..parallel.mesh import shard_batch

        return shard_batch(mesh, batch)

    def run_eval(opt_step):
        if ds_test is None or args.method_type != "Diffusion":
            return None
        eb = ds_test.get_batch(
            np.arange(min(args.eval_batch, len(ds_test)))
        )
        eps = lambda x, t: model.apply(state["ema_params"], x, t)
        rec = sampling_eval_1d(
            dcfg, sched, eps,
            {k: jnp.asarray(v) for k, v in eb.items()},
            jax.random.fold_in(key, 10_000 + opt_step),
            sample_steps=args.eval_sample_steps,
        )
        rec["step"] = opt_step
        with open(os.path.join(args.results_folder, "eval_records.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"eval @ {opt_step}: {rec}")
        return rec

    it = ds.iterate_batches(args.batch_size, seed=args.seed,
                            collision_frac=args.collision_frac)
    loss_hist: list[tuple[int, float]] = []
    accum = max(args.gradient_accumulate_every, 1)
    micro = 0
    start_step = int(state["step"])
    opt_step = start_step
    last_saved = opt_step
    last_logged = opt_step
    last_evaled = opt_step

    def next_launch_batch():
        if spl == 1:
            return shard(next(it))
        bs = [next(it) for _ in range(spl)]
        stacked = {k: np.stack([b[k] for b in bs]) for k in bs[0]}
        return shard(stacked)

    # the optimizer applies an update every `accum`-th micro-batch, so the
    # global step is host-computable — no per-step device sync, which keeps
    # the device pipeline full (dispatch runs ahead of execution)
    while opt_step < args.train_num_steps:
        batch = next_launch_batch()
        state, loss = step(state, batch, jax.random.fold_in(key, micro))
        micro += spl
        if spl == 1 and micro % accum:
            continue  # accumulation micro-batch, no optimizer update
        opt_step = start_step + micro // accum
        milestone = (opt_step - last_saved >= args.save_and_sample_every
                     and opt_step != last_saved)
        log = (opt_step - last_logged >= args.log_every or milestone
               or opt_step >= args.train_num_steps)
        if not log:
            continue
        last_logged = opt_step
        if spl > 1:
            loss = loss[-1]
        loss_f = float(loss)  # device sync only at log points
        if not np.isfinite(loss_f):
            # NaN guard: stop before poisoning checkpoints (the reference
            # rolls back to the last good checkpoint,
            # inference_1d_composing_time_steps.py:141-149)
            raise FloatingPointError(f"non-finite loss at step {opt_step}: {loss_f}")
        loss_hist.append((opt_step, loss_f))
        if milestone:
            # milestone id = global optimizer step: monotonic across resumed
            # runs with different save intervals, so "latest" is the newest
            mngr.save(opt_step, jax.device_get(state))
            last_saved = opt_step
            np.save(
                os.path.join(args.results_folder, "loss_curve.npy"),
                np.asarray(loss_hist, dtype=np.float64),
            )
            print(f"step {opt_step}: loss {loss_f:.6f} (saved milestone {opt_step})",
                  flush=True)
        else:
            print(f"step {opt_step}: loss {loss_f:.6f}", flush=True)
        if args.eval_every > 0 and opt_step - last_evaled >= args.eval_every:
            last_evaled = opt_step
            run_eval(opt_step)
    return state


if __name__ == "__main__":
    main()
