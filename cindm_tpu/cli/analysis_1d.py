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
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
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
        cond = batch["cond"]
        _, stitched = composing_time_sample(
            sched, eps, batch["x"].shape[0], args.rollout_steps,
            args.conditioned_steps, feat, cond, jax.random.PRNGKey(args.seed + 1),
            n_composed=args.n_composed, sampling_timesteps=args.sample_steps,
        )
        auto = autoregress_time_compose_sample(
            sched, eps, batch["x"].shape[0], args.rollout_steps,
            args.conditioned_steps, feat, cond, jax.random.PRNGKey(args.seed + 2),
            n_composed=args.n_composed, sampling_timesteps=args.sample_steps,
        )
        record["composing_time_finite"] = bool(jnp.all(jnp.isfinite(stitched)))
        record["autoregress_finite"] = bool(jnp.all(jnp.isfinite(auto)))

    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
