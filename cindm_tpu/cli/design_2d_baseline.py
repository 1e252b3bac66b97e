"""design_2d_baseline — GD / CEM airfoil design over FNO / LE-PDE surrogates.

Mirrors the reference 2D baseline scripts
(`inference/baseline/inverse_design_{GD,CEM}_discrete_{fno,lepde}[_twobds].py`,
SURVEY.md §2.3 E6), apples-to-apples with the CinDM path:

- the optimization starts from DATASET samples (state frames + boundary
  mask/offset), like the reference's ``testdata.node_feature`` clone
  (`inverse_design_GD_discrete_fno.py:305-322`), not from noise;
- out-of-distribution hinge losses keep the state and boundary inside the
  data manifold (``is_bdloss`` branch, `:396-401`): relu(‖u − ū‖ − ½·range);
- objective λ·|ΣFx| − ΣFy averaged over the scoring window (`:404-420`);
- the optimized mask/offset is reconstructed to a polygon and scored
  CLOSED-LOOP with the on-device BDIM solver (replacing the reference's
  boundary-txt → LilyPad → force-txt pipeline, E5), so GD/CEM baselines and
  CinDM designs share one metric.
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
    p.add_argument("--data_dir", default=None,
                   help="cache dir of generate_airfoil_sims for init states "
                        "and OOD statistics (generated if absent)")
    p.add_argument("--x_band", type=float, nargs=2, default=[0.25, 0.45])
    p.add_argument("--y_band", type=float, nargs=2, default=[0.4, 0.6])
    p.add_argument("--n_sims", type=int, default=4)
    p.add_argument("--num_boundaries", type=int, default=1)
    p.add_argument("--optim_iter", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4,
                   help="Adam lr (`inverse_design_GD_discrete_fno.py:322`)")
    p.add_argument("--rollout", type=int, default=4)
    p.add_argument("--lambda_force", type=float, default=1.0)
    p.add_argument("--is_bdloss", type=lambda s: s == "True", default=True,
                   help="add the OOD hinge losses (`:396-401`)")
    p.add_argument("--N", type=int, default=128, help="CEM population")
    p.add_argument("--Ne", type=int, default=16, help="CEM elites")
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--evaluate", type=lambda s: s == "True", default=True)
    p.add_argument("--n_warmup", type=int, default=300)
    p.add_argument("--n_record", type=int, default=100)
    p.add_argument("--is_testdata", type=lambda s: s == "True", default=False,
                   help="tiny BDIM datagen for smoke runs")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    import optax

    from ..baselines import FNO2d, LEPDE, LEPDEConfig
    from ..data.airfoil import AirfoilDataset, AirfoilDatasetConfig, generate_airfoil_sims
    from ..models.unet2d import ForceUnet
    from ..sampling.guidance2d import mask_denoise, unnormalize_state
    from ..train import CheckpointManager, TrainConfig, init_train_state, make_optimizer
    from ..utils import evaluate_designs, reconstruct_boundary
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    key = jax.random.PRNGKey(args.seed)
    B = args.batch_size

    # dataset: init states + OOD statistics (the reference clones dataset
    # samples into the optimization variables, `:310-320`)
    acfg = AirfoilDatasetConfig(
        input_steps=1, output_steps=1, time_interval=1,
        time_stamps=10 if args.is_testdata else 100,
        n_warmup=20 if args.is_testdata else 300,
        x_band=tuple(args.x_band), y_band=tuple(args.y_band),
    )
    data = generate_airfoil_sims(args.seed + 7, args.n_sims, acfg, cache_dir=args.data_dir)
    ds = AirfoilDataset(data, acfg)
    rng = np.random.default_rng(args.seed)
    idx = rng.integers(0, len(ds), B)
    batch = ds.get_batch(idx)
    u0 = jnp.asarray(batch["cond"])[..., :3]  # [B, 64, 64, 3] normalized state
    pad = ((0, 2), (0, 2), (0, 0))
    K = args.num_boundaries
    # K > 1: the reference's _twobds scripts initialize the optimization grid
    # from a double-boundary dataset sample (summed masks,
    # `inverse_design_GD_discrete_fno_twobds.py:153-166`); we synthesize the
    # K-boundary init by rolling K dataset boundaries to distinct vertical
    # stations and summing their mask/offset grids.
    def synth_composite(window_ids):
        """Sum K dataset boundaries rolled to distinct vertical stations →
        (mask [62,62,1], offset [62,62,2])."""
        m_sum = np.zeros((62, 62, 1), np.float32)
        o_sum = np.zeros((62, 62, 2), np.float32)
        for k, j in enumerate(window_ids):
            w = ds.get_window(int(j))
            m = w["mask"].astype(np.float32)
            o = w["offset"].astype(np.float32)
            if K > 1:
                rows = np.nonzero(m.sum(axis=1))[0]
                centroid = float(rows.mean()) if len(rows) else 31.0
                shift = int(round(62.0 * (k + 1) / (K + 1) - centroid))
                m = np.roll(m, shift, axis=0)
                o = np.roll(o, shift, axis=0)
            m_sum += m[..., None]
            o_sum += o
        return np.clip(m_sum, 0, 1), o_sum

    mask0_l, off0_l = [], []
    for b in range(B):
        ids = [idx[b]] if K == 1 else rng.integers(0, len(ds), K)
        m0, o0 = synth_composite(ids)
        mask0_l.append(np.pad(m0, pad))
        off0_l.append(np.pad(o0, pad))
    design0 = {"mask": jnp.asarray(np.stack(mask0_l), jnp.float32),
               "offset": jnp.asarray(np.stack(off0_l), jnp.float32)}

    # OOD hinge statistics: ½·range ball around the dataset mean
    # (mean_state/range_state, mean_bd/range_bd in the reference `:120-180`)
    all_states = ds._norm(data["fields"].reshape(-1, 62, 62, 3))
    mean_state = jnp.asarray(all_states.mean(0))  # [62, 62, 3]
    range_state = float(np.max(np.linalg.norm(
        (all_states - np.asarray(mean_state)).reshape(all_states.shape[0], -1), axis=1
    )))
    if K == 1:
        all_bd = np.concatenate([data["mask"][..., None], data["offset"]], -1)
    else:
        # OOD ball around K-boundary composites (the reference's _twobds
        # scripts draw init AND stats from a double-boundary dataset)
        comp = [synth_composite(rng.integers(0, len(ds), K)) for _ in range(64)]
        all_bd = np.stack([np.concatenate([m, o], -1) for m, o in comp])
    mean_bd = jnp.asarray(all_bd.mean(0))  # [62, 62, 3]
    range_bd = float(np.max(np.linalg.norm((all_bd - np.asarray(mean_bd)).reshape(all_bd.shape[0], -1), axis=1)))

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

    # must match train_force's architecture (dim 64, mults (1,2,4,8)) so
    # the force_paper checkpoint template lines up
    fmodel = ForceUnet(dim=64, dim_mults=(1, 2, 4, 8))
    fparams = fmodel.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 4)))
    if args.force_model_path:
        fmngr = CheckpointManager(args.force_model_path)
        fparams = fmngr.load(
            template=init_train_state(fparams, make_optimizer(TrainConfig()))
        )["ema_params"]

    def objective(design, u):
        """design: {'mask': [B,64,64,1], 'offset': [B,64,64,2]}; roll the
        surrogate, score λ|ΣFx| − ΣFy over frames + OOD hinges."""
        static = jnp.concatenate(
            [jnp.clip(design["mask"], 0, 1), jnp.clip(design["offset"], -0.5, 0.5)], -1
        )
        fx = fy = 0.0
        bd_loss = 0.0
        for _ in range(args.rollout):
            u = step_fn(sparams, u, static)
            press = unnormalize_state(u[..., 2:3], ds.p_min, ds.p_max)
            ld = fmodel.apply(fparams, jnp.concatenate([press, static], -1))
            fx = fx + jnp.sum(ld[:, 0])
            fy = fy + jnp.sum(ld[:, 1])
            if args.is_bdloss:
                d = jnp.linalg.norm(
                    (u[:, :62, :62] - mean_state).reshape(u.shape[0], -1), axis=1
                )
                bd_loss = bd_loss + jnp.sum(jax.nn.relu(d - 0.5 * range_state))
        if args.is_bdloss:
            db = jnp.linalg.norm(
                (static[:, :62, :62] - mean_bd).reshape(static.shape[0], -1), axis=1
            )
            bd_loss = bd_loss + jnp.sum(jax.nn.relu(db - 0.5 * range_bd))
        fx = fx / args.rollout
        fy = fy / args.rollout
        return args.lambda_force * jnp.abs(fx) - fy + bd_loss

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
            init_mean=flat0,
            clamp_fn=lambda f: f,
        )
        design = unflatten(best)
        record = {"design_method": "CEM", "surrogate": args.surrogate,
                  "obj_last": float(obj)}

    # closed-loop scoring: mask → polygon → BDIM lift/drag (same metric as
    # the CinDM path in design_2d.py), replacing reference E5
    mask_np = np.asarray(design["mask"])[:, :62, :62, 0]
    off_np = np.asarray(design["offset"])[:, :62, :62, :]
    # valid design = exactly K disjoint clusters reconstruct to polygons
    # (clusters are disjoint in the shared mask by construction, so the
    # pairwise-overlap rejection of the CinDM path is subsumed)
    poly_sets, valid = [], 0
    for b in range(B):
        m = np.asarray(mask_denoise(jnp.asarray(mask_np[b])))
        ps = reconstruct_boundary(m, off_np[b])
        if len(ps) == K:
            poly_sets.append(ps)
            valid += 1
    record["valid_designs"] = valid
    record["batch_size"] = B
    record["num_boundaries"] = K
    if args.evaluate and poly_sets:
        M = max(len(p) for ps in poly_sets for p in ps)
        batchpolys = np.stack([
            np.stack([np.pad(p, ((0, M - len(p)), (0, 0)), mode="edge") for p in ps])
            for ps in poly_sets
        ])  # [valid, K, M, 2]
        scores = evaluate_designs(batchpolys, n_warmup=args.n_warmup, n_record=args.n_record)
        record.update({k: float(v) for k, v in scores.items()
                       if np.ndim(v) == 0})
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
