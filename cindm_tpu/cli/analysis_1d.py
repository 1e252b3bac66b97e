"""analysis_1d — model-quality analysis CLI.

Mirrors the E7 analysis scripts (`inference/analysis_1d.py`,
`inference/inference_1d_composing_time_steps.py`,
`inference/inference_1d_composing_multibodies.py`, SURVEY.md §2.3): given a
trained diffusion checkpoint, report (a) DDIM-sampled trajectory MAE/RMSE
vs ground truth, and (b) a comparison of the time-composition strategies
(EBM-compose / parallel-chained / autoregressive) on the same horizon.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="1D analysis (TPU)")
    p.add_argument("--dataset", default="nbody-2")
    p.add_argument("--model_path", default="./results/nbody")
    p.add_argument("--milestone", type=int, default=None)
    p.add_argument("--conditioned_steps", type=int, default=0)
    p.add_argument("--rollout_steps", type=int, default=24)
    p.add_argument("--Unet_dim", type=int, default=64)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--sample_steps", type=int, default=250)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--n_sims", type=int, default=8)
    p.add_argument("--n_composed", type=int, default=0,
                   help=">0 also compares time-composition strategies")
    p.add_argument("--direct_model_path", default=None,
                   help="checkpoint of a model trained directly at the long "
                        "horizon cond+(n_composed+1)*rollout; adds the "
                        "reference's 'direct' strategy "
                        "(inference_1d_composing_time_steps.py:218-254)")
    p.add_argument("--compose_multibodies", type=int, default=0,
                   help="total bodies N > 2: compare multibody composition "
                        "strategies (pairwise compose vs classifier-free "
                        "EBM compose with ULA/UHMC) on N-body forecast MAE "
                        "(inference_1d_composing_multibodies.py)")
    p.add_argument("--uncond_model_path", default=None,
                   help="checkpoint of a 1-body (unconditional) model; "
                        "enables the classifier-free compose strategies "
                        "(the reference's model_unconditioned, "
                        "diffusion_1d.py:1895-1901)")
    p.add_argument("--cf_coefficient", type=float, default=1.4,
                   help="classifier-free compose coefficient "
                        "(diffusion_1d.py:1902)")
    p.add_argument("--langevin_steps", type=int, default=10,
                   help="ULA steps per reverse step above t_switch (L)")
    p.add_argument("--t_switch", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None,
                   help="also write the JSON record to this path")
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..core import make_schedule
    from ..data.nbody import NBodyDataset, NBodyDatasetConfig
    from ..models import TemporalUnet1D
    from ..sampling import Diffusion1DConfig
    from ..sampling.compose_time import (
        autoregress_time_compose_sample,
        composing_time_sample,
    )
    from ..train import (
        CheckpointManager,
        TrainConfig,
        init_train_state,
        make_optimizer,
        sampling_eval_1d,
    )
    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    n_bodies = int(args.dataset.split("-")[1])
    feat = n_bodies * 4
    horizon = args.conditioned_steps + args.rollout_steps

    model = TemporalUnet1D(
        horizon=horizon, transition_dim=feat, dim=args.Unet_dim, attention=True
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, horizon, feat)), jnp.zeros(1, jnp.int32)
    )
    mngr = CheckpointManager(args.model_path)
    template = init_train_state(params, make_optimizer(TrainConfig()))
    params = mngr.load(args.milestone, template=template)["ema_params"]

    dcfg = Diffusion1DConfig(
        rollout_steps=args.rollout_steps,
        conditioned_steps=args.conditioned_steps,
        timesteps=args.timesteps,
    )
    sched = make_schedule(args.timesteps)
    ds = NBodyDataset(
        NBodyDatasetConfig(
            n_bodies=n_bodies,
            input_steps=args.conditioned_steps,
            output_steps=args.rollout_steps,
        ),
        n_sims=args.n_sims,
        seed=args.seed + 1,
    )
    batch = {
        k: jnp.asarray(v)
        for k, v in ds.get_batch(np.arange(args.batch_size)).items()
    }

    eps = lambda x, t: model.apply(params, x, t)
    record = sampling_eval_1d(
        dcfg, sched, eps, batch, jax.random.PRNGKey(args.seed),
        sample_steps=args.sample_steps,
    )

    if args.n_composed > 0 and args.conditioned_steps > 0:
        # Strategy comparison on one shared long horizon, matching
        # `inference_1d_composing_time_steps.py:150-415`: ground truth is a
        # (n_composed+1)·rollout window continuing the conditioned frames;
        # every strategy's stitched trajectory is scored with MAE/RMSE
        # against it (the reference plots loss_item per sample; we report
        # the batch means).
        from ..physics.nbody import simulate

        L = (args.n_composed + 1) * args.rollout_steps
        ds_long = NBodyDataset(
            NBodyDatasetConfig(
                n_bodies=n_bodies,
                input_steps=args.conditioned_steps,
                output_steps=L,
            ),
            data=ds.data,
        )
        lb = {
            k: jnp.asarray(v)
            for k, v in ds_long.get_batch(np.arange(args.batch_size)).items()
        }
        cond, gt = lb["cond"], lb["x"]
        B = gt.shape[0]

        def score(pred):
            err = jnp.abs(pred - gt[:, : pred.shape[1]])
            return {
                "mae": float(jnp.mean(err)),
                "rmse": float(jnp.sqrt(jnp.mean(err**2))),
            }

        strategies = {}
        img0, stitched = composing_time_sample(
            sched, eps, B, args.rollout_steps, args.conditioned_steps,
            feat, cond, jax.random.PRNGKey(args.seed + 1),
            n_composed=args.n_composed, sampling_timesteps=args.sample_steps,
        )
        strategies["EBMs_compose"] = score(jnp.concatenate([img0, stitched], axis=1))

        auto = autoregress_time_compose_sample(
            sched, eps, B, args.rollout_steps, args.conditioned_steps,
            feat, cond, jax.random.PRNGKey(args.seed + 2),
            n_composed=args.n_composed, sampling_timesteps=args.sample_steps,
        )
        strategies["autoregress"] = score(auto)

        # SimuSolver: the ground-truth integrator itself rolled from the last
        # conditioned frame — the floor any learned strategy is chasing
        # (`inference_1d_composing_time_steps.py:330-347`)
        state = (cond[:, -1] * 200.0).reshape(B, n_bodies, 4)
        traj = simulate(state, L * 4)[:, 3::4]
        strategies["SimuSolver"] = score(traj.reshape(B, L, feat) / 200.0)

        if args.direct_model_path:
            model_d = TemporalUnet1D(
                horizon=args.conditioned_steps + L,
                transition_dim=feat, dim=args.Unet_dim, attention=True,
            )
            params_d = model_d.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, args.conditioned_steps + L, feat)),
                jnp.zeros(1, jnp.int32),
            )
            mngr_d = CheckpointManager(args.direct_model_path)
            template_d = init_train_state(params_d, make_optimizer(TrainConfig()))
            params_d = mngr_d.load(template=template_d)["ema_params"]
            from ..sampling.sampler import ddim_sample_loop

            def cond_eps(x, t):
                full = jnp.concatenate([cond, x], axis=1)
                return model_d.apply(params_d, full, t)[:, args.conditioned_steps:]

            direct = ddim_sample_loop(
                sched, cond_eps, (B, L, feat), jax.random.PRNGKey(args.seed + 3),
                sampling_timesteps=args.sample_steps,
            )
            strategies["direct"] = score(direct)

        record["compose_strategies"] = strategies

    if args.compose_multibodies > 2:
        # Multibody strategy comparison (`inference_1d_composing_multibodies.py`):
        # forecast an N-body trajectory from the 2-body prior via (a) the
        # pairwise inside-composition operator (the CinDM design operator),
        # (b) classifier-free EBM composition Σ_pairs ε − c·ε_uncond sampled
        # with ULA-above-t_switch, and (c) the UHMC variant; scored against
        # the on-device simulator ground truth like the reference's
        # loss_mean (`:357`).
        from ..sampling import sample
        from ..sampling.compose_time import (
            make_classifier_free_compose_eps,
            sample_compose_multibodies,
            sample_compose_multibodies_uhmc,
        )

        N = args.compose_multibodies
        ds_n = NBodyDataset(
            NBodyDatasetConfig(
                n_bodies=N,
                input_steps=args.conditioned_steps,
                output_steps=args.rollout_steps,
            ),
            n_sims=args.n_sims,
            seed=args.seed + 2,
        )
        nb = {
            k: jnp.asarray(v)
            for k, v in ds_n.get_batch(np.arange(args.batch_size)).items()
        }
        gt_n, cond_n = nb["x"], nb.get("cond")

        # The reference analyses run CONDITIONED forecasts and score them
        # against dataset ground truth (`inference_1d_composing_multibodies.py
        # :339-357`). With a conditioned_steps==0 prior, the equivalent
        # grounding is q-sample inpainting of the first ground-truth frame
        # (`model/diffusion_1d.py:1715-1718`); the scored region is the
        # forecast frames after the inpainted/conditioned ones.
        cs = args.conditioned_steps
        # model-side conditioning length vs gt-side forecast offset: with
        # cs>0 the dataset's gt_n ("x") is the y-window (forecast frames
        # only, cond separate); with cs==0 gt_n is the full horizon window
        # whose frame 0 we inpaint, so scoring starts at frame 1.
        k_cond = cs if cs > 0 else 1
        fc_start = 0 if cs > 0 else 1
        cond_frames = cond_n if cs > 0 else gt_n[:, :1]

        def score_n(pred_forecast):
            """pred_forecast frames align with gt_n[fc_start:]."""
            L = min(pred_forecast.shape[1], gt_n.shape[1] - fc_start)
            err = jnp.abs(pred_forecast[:, :L] - gt_n[:, fc_start : fc_start + L])
            return {
                "mae": float(jnp.mean(err)),
                "rmse": float(jnp.sqrt(jnp.mean(err**2))),
            }

        multi = {}
        pairwise = sample(
            dcfg, sched, eps, jax.random.PRNGKey(args.seed + 5),
            args.batch_size, N * 4,
            cond=cond_frames,
            compose_n_bodies=N, n_composed=0,
            sample_steps=args.timesteps,
        )
        # composed cond-0 sampling returns the full horizon incl. the
        # inpainted frames; conditioned sampling returns the rollout only
        pairwise_fc = pairwise[:, 1:] if cs == 0 else pairwise
        multi["pairwise_compose"] = score_n(pairwise_fc)

        if args.uncond_model_path:
            model_u = TemporalUnet1D(
                horizon=horizon, transition_dim=4, dim=args.Unet_dim,
                attention=True,
            )
            params_u = model_u.init(
                jax.random.PRNGKey(0), jnp.zeros((1, horizon, 4)),
                jnp.zeros(1, jnp.int32),
            )
            mngr_u = CheckpointManager(args.uncond_model_path)
            template_u = init_train_state(params_u, make_optimizer(TrainConfig()))
            params_u = mngr_u.load(template=template_u)["ema_params"]
            eps_u = lambda x, t: model_u.apply(params_u, x, t)

            ceps = make_classifier_free_compose_eps(
                eps, eps_u, N, coefficient=args.cf_coefficient
            )
            # the model horizon is fixed: inpainted/cond frames + forecast
            # frames must sum to `horizon` for the TemporalUnet1D input
            fc_steps = horizon - k_cond
            ula = sample_compose_multibodies(
                sched, ceps, cond_frames, fc_steps,
                jax.random.PRNGKey(args.seed + 6),
                langevin_steps=args.langevin_steps, t_switch=args.t_switch,
                conditioned_steps=k_cond,
            )
            multi["cf_compose_ULA"] = score_n(ula)

            uhmc = sample_compose_multibodies_uhmc(
                sched, ceps, cond_frames, fc_steps,
                jax.random.PRNGKey(args.seed + 7),
                t_switch=args.t_switch,
                conditioned_steps=k_cond,
            )
            multi["cf_compose_UHMC"] = score_n(uhmc)

        from ..physics.nbody import simulate

        # last grounded frame -> forecast; frame j of traj_n aligns with
        # gt frame (fc_start + j) one dt early (the eval_simu recording
        # convention, physics/nbody.py:105-127)
        state0 = (gt_n[:, 0] * 200.0 if cs == 0
                  else cond_n[:, -1] * 200.0).reshape(args.batch_size, N, 4)
        n_fc = gt_n.shape[1] - fc_start
        traj_n = simulate(state0, n_fc * 4)[:, 3::4]
        multi["SimuSolver"] = score_n(
            traj_n.reshape(args.batch_size, n_fc, N * 4) / 200.0
        )
        record["multibody_strategies"] = multi

    print(json.dumps(record))
    if args.out:
        import os

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
    return record


if __name__ == "__main__":
    main()
