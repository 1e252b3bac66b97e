"""train_baseline — FNO / LE-PDE surrogate training CLI.

Mirrors the used core of `train/train_baseline.py` + `le_pde/argparser.py`
(the reference exposes 186 flags; the ones that matter for the paper's
airfoil surrogates are algo, latent size, epochs, batch): trains an FNO2d
or LE-PDE one-step evolution model on BDIM-generated airfoil data, with the
reference's save/reload self-check (`unittest_model`,
`le_pde/models.py:2677-2790`).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train FNO/LE-PDE surrogates (TPU)")
    p.add_argument("--algo", default="fno", help="fno | lepde (reference: fno-m20-w32, contrastive)")
    p.add_argument("--dataset", default="naca_ellipse_lepde")
    p.add_argument("--n_sims", type=int, default=4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps_per_epoch", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--latent_size", type=int, default=160)
    p.add_argument("--fno_modes", type=int, default=12)
    p.add_argument("--fno_width", type=int, default=32)
    p.add_argument("--multi_step", default="1",
                   help="weighted multi-step loss spec, le_pde format "
                        "(`le_pde/utils.py:713`): '1^2:1e-2^4:1e-3' rolls "
                        "the surrogate to step 4 and weights losses at "
                        "steps 1/2/4; a bare int trains single/uniform")
    p.add_argument("--multi_step_start_epoch", type=int, default=0,
                   help="epochs before this use single-step loss "
                        "(`le_pde/argparser.py:212`)")
    p.add_argument("--loss_type", default="mse", choices=["mse", "l1", "huber"],
                   help="elementwise loss (`le_pde/utils.py:410` loss_op_core)")
    p.add_argument("--data_noise_amp", type=float, default=0.0,
                   help="gaussian noise added to the input state during "
                        "training (`le_pde/argparser.py:60`)")
    p.add_argument("--lr_scheduler_type", default="none", choices=["none", "cos"],
                   help="'cos' = cosine decay over the full run "
                        "(`le_pde/models.py:2594` build_optimizer)")
    p.add_argument("--weight_decay", type=float, default=0.0,
                   help="adamw decoupled weight decay")
    p.add_argument("--val_fraction", type=float, default=0.1,
                   help="held-out window fraction; per-epoch val loss goes "
                        "into the experiment record")
    p.add_argument("--results_folder", default="./results/baseline")
    p.add_argument("--is_unittest", type=lambda s: s == "True", default=True)
    p.add_argument("--data_cache", default=None,
                   help="generate_airfoil_sims cache dir shared across CLIs")
    p.add_argument("--x_band", type=float, nargs=2, default=[0.25, 0.45])
    p.add_argument("--y_band", type=float, nargs=2, default=[0.4, 0.6])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--is_testdata", type=lambda s: s == "True", default=True)
    p.add_argument("--n_devices", type=int, default=0,
                   help="DP-shard the train step over a data mesh of this "
                        "many chips (0 = single device)")
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..baselines import FNO2d, LEPDE, LEPDEConfig, lepde_loss
    from ..data.airfoil import AirfoilDataset, AirfoilDatasetConfig, generate_airfoil_sims
    from ..physics.bdim import BDIMConfig
    from ..train import CheckpointManager, TrainConfig, init_train_state, make_optimizer, make_train_step_from_loss

    from ..utils.cache import enable_compile_cache

    from ..baselines.harness import (
        experiment_record,
        multi_step_loss,
        parse_multi_step,
    )

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    ms_dict = parse_multi_step(args.multi_step)
    max_step = max(ms_dict)
    acfg = AirfoilDatasetConfig(
        input_steps=1, output_steps=max_step, time_interval=1,
        time_stamps=40 if args.is_testdata else 100,
        n_warmup=60 if args.is_testdata else 300,
        x_band=tuple(args.x_band), y_band=tuple(args.y_band),
    )
    data = generate_airfoil_sims(
        args.seed, args.n_sims, acfg, BDIMConfig(), cache_dir=args.data_cache
    )
    ds = AirfoilDataset(data, acfg)
    key = jax.random.PRNGKey(args.seed)

    def make_batch(b, w_list):
        """u_t [B, 64, 64, 3], static [B, 64, 64, 3], targets [B, K, 64, 64, 3]"""
        u = jnp.asarray(b["cond"])[..., :3]  # 1 cond frame = 3 channels
        aux_list = []
        for w in w_list:
            aux = np.concatenate([w["mask"][..., None], w["offset"]], axis=-1)
            aux_list.append(np.pad(aux, ((0, 2), (0, 2), (0, 0))))
        static = jnp.asarray(np.stack(aux_list), jnp.float32)
        pred = jnp.asarray(b["x"])[..., : 3 * acfg.output_steps]
        B = pred.shape[0]
        targets = pred.reshape(B, 64, 64, acfg.output_steps, 3).transpose(0, 3, 1, 2, 4)
        return u, static, targets

    # single-step dict used before multi_step_start_epoch
    # (`le_pde/argparser.py:212-213`)
    ms_single = {1: 1.0}

    def noised(u, key):
        if args.data_noise_amp <= 0:
            return u
        return u + args.data_noise_amp * jax.random.normal(key, u.shape, u.dtype)

    if args.algo.startswith("fno"):
        model = FNO2d(out_channels=3, modes=args.fno_modes, width=args.fno_width)
        x0 = jnp.zeros((1, 64, 64, 6))  # state 3 + static 3
        params = model.init(key, x0)

        def make_loss(ms, noise):
            def loss_fn(params, batch, key):
                u, static, targets = batch
                if noise:
                    u = noised(u, key)
                # autoregressive stepper like get_data_next_step
                # (`le_pde/utils.py:137`), weighted per listed step
                step = lambda cur: model.apply(
                    params, jnp.concatenate([cur, static], -1)
                )
                return multi_step_loss(step, u, targets, ms, args.loss_type)

            return loss_fn
    elif args.algo.startswith("lepde") or args.algo.startswith("contrastive"):
        lcfg = LEPDEConfig(latent_size=args.latent_size)
        model = LEPDE(lcfg, out_hw=64)
        params = model.init(
            key, jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)), 1
        )

        def make_loss(ms, noise):
            def loss_fn(params, batch, key):
                u, static, targets = batch
                if noise:
                    u = noised(u, key)
                return lepde_loss(model, params, u, static, targets,
                                  multi_step_dict=ms, loss_type=args.loss_type)

            return loss_fn
    else:
        raise ValueError(args.algo)

    loss_fn = make_loss(ms_dict, noise=True)
    loss_fn_single = make_loss(ms_single, noise=True)
    val_loss_fn = jax.jit(make_loss(ms_dict, noise=False))

    print(f"Number of parameter: {sum(p.size for p in jax.tree.leaves(params))/1e6:.2f}M")
    tcfg = TrainConfig(lr=args.lr, ema_update_every=1)
    # adamw / cosine variants mirror build_optimizer (`le_pde/models.py:2594`)
    import optax

    if args.lr_scheduler_type == "cos":
        sched_lr = optax.cosine_decay_schedule(
            args.lr, max(args.epochs * args.steps_per_epoch, 1)
        )
    else:
        sched_lr = args.lr
    if args.weight_decay > 0 or args.lr_scheduler_type != "none":
        tx = optax.chain(
            optax.clip_by_global_norm(tcfg.grad_clip),
            optax.adamw(sched_lr, b1=tcfg.adam_b1, b2=tcfg.adam_b2,
                        weight_decay=args.weight_decay),
        )
    else:
        tx = make_optimizer(tcfg)
    state = init_train_state(params, tx)
    mesh = None
    if args.n_devices > 0:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(args.n_devices, ("data",))
    step = make_train_step_from_loss(loss_fn, tcfg, mesh=mesh, tx=tx)
    step_single = (
        make_train_step_from_loss(loss_fn_single, tcfg, mesh=mesh, tx=tx)
        if args.multi_step_start_epoch > 0 else step
    )
    mngr = CheckpointManager(args.results_folder)

    # held-out val windows (per-epoch val loss -> experiment record)
    n_val = int(len(ds) * args.val_fraction)
    val_idx = np.arange(len(ds) - n_val, len(ds)) if n_val else None
    n_train = len(ds) - n_val

    def eval_val(state):
        if val_idx is None:
            return None
        b = ds.get_batch(val_idx[: min(64, len(val_idx))])
        w_list = [ds.get_window(int(j)) for j in val_idx[: min(64, len(val_idx))]]
        return float(val_loss_fn(state["params"], make_batch(b, w_list), key))

    history = []
    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        use = step_single if epoch < args.multi_step_start_epoch else step
        ep_losses = []
        for i in range(args.steps_per_epoch):
            idx = rng.integers(0, n_train, args.batch_size)
            b = ds.get_batch(idx)
            w_list = [ds.get_window(int(j)) for j in idx]
            batch = make_batch(b, w_list)
            state, loss = use(state, batch, jax.random.fold_in(key, epoch * 1000 + i))
            ep_losses.append(float(loss))
            print(f"epoch {epoch} step {i}: loss {float(loss):.6f}")
        vl = eval_val(state)
        history.append({"epoch": epoch, "train_loss": float(np.mean(ep_losses)),
                        "val_loss": vl})
        if vl is not None:
            print(f"epoch {epoch}: val_loss {vl:.6f}")
        mngr.save(epoch + 1, state)

    if args.is_unittest:
        # save→reload determinism self-check (`le_pde/models.py:2677-2790`)
        restored = mngr.load(args.epochs, template=state)
        idx = rng.integers(0, len(ds), 2)
        b = ds.get_batch(idx)
        w_list = [ds.get_window(int(j)) for j in idx]
        u, static, targets = make_batch(b, w_list)
        if args.algo.startswith("fno"):
            a = model.apply(state["params"], jnp.concatenate([u, static], -1))
            bb = model.apply(restored["params"], jnp.concatenate([u, static], -1))
        else:
            a = model.apply(state["params"], u, static, 1)
            bb = model.apply(restored["params"], u, static, 1)
        maxdiff = float(jnp.max(jnp.abs(a - bb)))
        assert maxdiff < 8e-5, f"unittest_model failed: {maxdiff}"
        print(f"unittest_model passed (max diff {maxdiff:.2e})")

    rec_path = experiment_record(
        args.results_folder, vars(args), history,
        final={"val_loss": history[-1]["val_loss"] if history else None,
               "train_loss": history[-1]["train_loss"] if history else None},
    )
    print(f"experiment record -> {rec_path}")
    return state


if __name__ == "__main__":
    main()
