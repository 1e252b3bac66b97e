"""train_2d — airfoil diffusion training CLI.

Mirrors `train/train_2d.py:7-26` flags (cond_frames 2, pred_frames 4,
ts 4, batch 48, is_testdata default True = smoke run). Data comes from the
on-device BDIM solver instead of pre-generated LilyPad dumps.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train airfoil diffusion (TPU)")
    p.add_argument("--cond_frames", type=int, default=2)
    p.add_argument("--pred_frames", type=int, default=4)
    p.add_argument("--ts", type=int, default=4, help="time interval")
    p.add_argument("--batch_size", type=int, default=48)
    p.add_argument("--train_num_steps", type=int, default=6)
    p.add_argument("--save_and_sample_every", type=int, default=2)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--is_testdata", type=lambda s: s == "True", default=True)
    p.add_argument("--n_sims", type=int, default=4)
    p.add_argument("--results_folder", default="./results/airfoil")
    p.add_argument("--data_cache", default=None)
    p.add_argument("--x_band", type=float, nargs=2, default=[0.25, 0.45],
                   help="boundary placement x band (fraction of grid)")
    p.add_argument("--y_band", type=float, nargs=2, default=[0.4, 0.6],
                   help="boundary placement y band; widen (e.g. 0.2 0.8) to "
                        "support multi-boundary region-partition designs")
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--steps_per_launch", type=int, default=1,
                   help="micro-steps fused into one lax.scan device launch")
    p.add_argument("--device_data", type=lambda s: s == "True", default=True,
                   help="keep the whole dataset in HBM and gather batches "
                        "on device (zero per-step host transfer)")
    p.add_argument("--resume", type=lambda s: s == "True", default=False)
    p.add_argument("--remat", type=lambda s: s == "True", default=False,
                   help="block-level nn.remat inside the denoiser: backward "
                        "recomputes each ResnetBlock/attention interior "
                        "instead of storing it — required to fit batch 48 "
                        "alongside a multi-GB device-resident dataset in "
                        "16G HBM (param structure unchanged)")
    p.add_argument("--n_devices", type=int, default=0,
                   help="DP-shard the train step over a data mesh of this "
                        "many chips (0 = single device)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..core import make_schedule
    from ..data.airfoil import AirfoilDataset, AirfoilDatasetConfig, generate_airfoil_sims
    from ..models.unet2d import Unet2D
    from ..physics.bdim import BDIMConfig
    from ..sampling.diffusion2d import Diffusion2DConfig
    from ..train import (
        CheckpointManager,
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step_2d,
        make_train_step_from_loss,
    )

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    acfg = AirfoilDatasetConfig(
        input_steps=args.cond_frames, output_steps=args.pred_frames,
        time_interval=args.ts,
        time_stamps=40 if args.is_testdata else 100,
        n_warmup=60 if args.is_testdata else 300,
        x_band=tuple(args.x_band), y_band=tuple(args.y_band),
    )
    data = generate_airfoil_sims(
        args.seed, args.n_sims, acfg, BDIMConfig(), cache_dir=args.data_cache
    )
    ds = AirfoilDataset(data, acfg)

    cfg = Diffusion2DConfig(
        frames=args.cond_frames + args.pred_frames,
        cond_frames=args.cond_frames,
        pred_frames=args.pred_frames,
        timesteps=args.timesteps,
    )
    model = Unet2D(dim=64, dim_mults=(1, 2), channels=cfg.channels,
                   remat=args.remat)
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((1, 64, 64, cfg.channels)), jnp.zeros(1, jnp.int32))
    print(f"Number of parameter: {sum(p.size for p in jax.tree.leaves(params))/1e6:.2f}M")

    sched = make_schedule(cfg.timesteps, cfg.beta_schedule)
    tcfg = TrainConfig()
    state = init_train_state(params, make_optimizer(tcfg))
    mesh = None
    if args.n_devices > 0:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices, ("data",))
    spl = max(args.steps_per_launch, 1)
    if args.device_data:
        from ..sampling.diffusion2d import p_losses_2d

        prep = (os.path.join(args.data_cache, "flatrows_v1.npy")
                if args.data_cache else None)
        draw = ds.make_device_sampler(min(args.batch_size, len(ds)),
                                      prep_cache=prep)

        def loss_fn(params, arrays, key):
            kb, kl = jax.random.split(key)
            b = draw(arrays, kb)
            eps = lambda x, t: model.apply(params, x, t)
            return p_losses_2d(cfg, sched, eps, b["x"], b["cond"], kl)

        step = make_train_step_from_loss(loss_fn, tcfg, mesh=mesh,
                                         steps_per_launch=spl,
                                         broadcast_batch=True)
    else:
        step = make_train_step_2d(model.apply, cfg, sched, tcfg, mesh=mesh,
                                  steps_per_launch=spl)
    mngr = CheckpointManager(args.results_folder)
    start = 0
    if args.resume and mngr.latest_milestone() is not None:
        state = mngr.load(template=state)
        start = int(state["step"])
        print(f"resumed from step {start}")
    it = None
    if not args.device_data:
        it = ds.iterate_batches(min(args.batch_size, len(ds)), seed=args.seed)
    import numpy as np

    dummy = draw.arrays if args.device_data else None
    step_no = start
    last_saved = start
    last_logged = start
    while step_no < args.train_num_steps:
        if args.device_data:
            batch = dummy
        elif spl == 1:
            b = next(it)
            batch = {"x": jnp.asarray(b["x"]), "cond": jnp.asarray(b["cond"])}
        else:
            bs = [next(it) for _ in range(spl)]
            batch = {k: jnp.asarray(np.stack([b[k] for b in bs]))
                     for k in ("x", "cond")}
        state, loss = step(state, batch, jax.random.fold_in(key, step_no))
        step_no += spl
        if spl > 1:
            loss = loss[-1]
        milestone = step_no - last_saved >= args.save_and_sample_every
        if milestone or step_no - last_logged >= args.log_every or step_no >= args.train_num_steps:
            last_logged = step_no
            loss_f = float(loss)  # device sync only at log points
            if not np.isfinite(loss_f):
                raise FloatingPointError(f"non-finite loss at step {step_no}")
            print(f"step {step_no}: loss {loss_f:.6f}", flush=True)
            if milestone:
                mngr.save(step_no, jax.device_get(state))
                last_saved = step_no
    return state


if __name__ == "__main__":
    main()
