"""8-body/54-step guidance-coefficient sweep (VERDICT round-2 #2, round-3 #3).

RESULTS.md hypothesizes the 8-body composed config (flagship, Table 2 of
arXiv:2401.13171) needs guidance tuning at large n rather than more
training: the collision-enrichment lever plateaued (0.3185 at +10k
fine-tune, 0.3256 at +40k). This sweeps design_coef x consistency_coef x
recurrence-K on the composed 8-body sampler and records every point
(favorable or not) to results/designs/sweep8.json.

Compile-efficient layout: guidance is a sum of independent per-sample
terms, so the whole (design_coef x consistency_coef) grid folds into the
BATCH axis with per-sample coefficient vectors (see get_design_fn) — one
compile + one sampling run per recurrence value instead of one multi-minute
remote compile per grid point (the round-3 killer: compiles ran 40 s–10 min
on the axon tunnel).

Reference anchor: the paper script fixes coef 0.2/0.2 with
standard-recurrence-10 for all rows (`scripts_paper/1D/cindm.sh`); the
sweep asks whether that transfer to n=8 is optimal.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import itertools
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="./results/nbody2_coll")
    ap.add_argument("--milestone", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=64,
                    help="samples PER grid point (the folded run denoises "
                         "batch_size * n_combos candidates at once)")
    ap.add_argument("--out", default="./results/designs/sweep8.json")
    ap.add_argument("--design_coefs", type=float, nargs="+",
                    default=[0.1, 0.2, 0.4])
    ap.add_argument("--consistency_coefs", type=float, nargs="+",
                    default=[0.2, 0.6])
    ap.add_argument("--recurrences", type=int, nargs="+", default=[10, 20])
    ap.add_argument("--compose_n_bodies", type=int, default=8)
    ap.add_argument("--n_composed", type=int, default=2)
    ap.add_argument("--sample_steps", type=int, default=1000)
    ap.add_argument("--host_chunks", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--normalize_grad_per_body", action="store_true",
                    help="run the per-body gradient-normalization ablation "
                         "(scale the objective by 2/n_bodies)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cindm_tpu.core import make_schedule
    from cindm_tpu.models import TemporalUnet1D
    from cindm_tpu.physics import eval_simu
    from cindm_tpu.sampling import (
        Diffusion1DConfig,
        confidence_interval_95,
        get_design_fn,
        get_eval_fn,
        get_eval_fn_per_sample,
        sample,
    )
    from cindm_tpu.train import (
        CheckpointManager, TrainConfig, init_train_state, make_optimizer,
    )
    from cindm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    horizon, feat = 24, 8  # 2-body prior (cond 0 + rollout 24)
    model = TemporalUnet1D(horizon=horizon, transition_dim=feat, dim=64,
                           attention=True)
    params0 = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, horizon, feat)),
                         jnp.zeros(1, jnp.int32))
    mngr = CheckpointManager(args.model_path)
    template = init_train_state(params0, make_optimizer(TrainConfig()))
    state = mngr.load(args.milestone, template=template)
    params = state["ema_params"]
    eps = lambda x, t: model.apply(params, x, t)

    dcfg = Diffusion1DConfig(rollout_steps=24, conditioned_steps=0,
                             timesteps=1000)
    sched = make_schedule(1000)
    target = jnp.asarray([0.5, 0.5])
    eval_each = get_eval_fn_per_sample(target, last_n_step=1)
    norm_factor = (2.0 / args.compose_n_bodies
                   if args.normalize_grad_per_body else 1.0)

    combos = list(itertools.product(args.design_coefs,
                                    args.consistency_coefs))
    Bper = args.batch_size
    Btot = Bper * len(combos)
    coef_vec = jnp.asarray(np.repeat([dc for dc, _ in combos], Bper))
    cc_vec = jnp.asarray(np.repeat([cc for _, cc in combos], Bper))

    rows = []

    def flush():
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)

    for rec_k in args.recurrences:
        t0 = time.time()
        design_fn = get_design_fn(
            target, last_n_step=1, coef=coef_vec,
            time_consistency_coef=cc_vec, norm_factor=norm_factor,
        )
        try:
            out = sample(
                dcfg, sched, eps, jax.random.PRNGKey(args.seed),
                batch_size=Btot, feature_size=args.compose_n_bodies * 4,
                design_fn=design_fn,
                design_guidance=f"standard-recurrence-{rec_k}",
                n_composed=args.n_composed,
                compose_n_bodies=args.compose_n_bodies,
                sample_steps=args.sample_steps,
                host_chunks=args.host_chunks,
                fold_chunks=0,  # auto-slice at the measured FOLD_TARGET
            )
            total_rollout = out.shape[1] - 1
            eval_fn = get_eval_fn(target, last_n_step=1)
            pred_simu, _ = eval_simu(
                out[:, :1], eval_fn, n_bodies=args.compose_n_bodies,
                rollout_steps=total_rollout,
            )
            per_sample = np.asarray(eval_each(pred_simu))
            abs_err = np.asarray(
                jnp.mean(jnp.abs(out[:, 1:] - pred_simu), axis=(1, 2)))
            sq_err = np.asarray(
                jnp.mean(jnp.square(out[:, 1:] - pred_simu), axis=(1, 2)))
            wall = round(time.time() - t0, 1)
            for ci_, (dc, cc) in enumerate(combos):
                sl = slice(ci_ * Bper, (ci_ + 1) * Bper)
                ps = per_sample[sl]
                rows.append({
                    "design_coef": dc, "consistency_coef": cc,
                    "recurrence": rec_k,
                    "design_obj": float(np.mean(ps)),
                    "design_obj_ci95": float(
                        confidence_interval_95(jnp.asarray(ps))),
                    "MAE": float(np.mean(abs_err[sl])),
                    "RMSE": float(np.sqrt(np.mean(sq_err[sl]))),
                    "batch_size": Bper,
                    "compose_n_bodies": args.compose_n_bodies,
                    "n_composed": args.n_composed,
                    "normalize_grad_per_body": bool(
                        args.normalize_grad_per_body),
                    "wall_s_folded_run": wall,
                })
                print("POINT", json.dumps(rows[-1]), flush=True)
        except Exception as e:  # record the failure, keep sweeping
            rows.append({"recurrence": rec_k, "error": repr(e),
                         "combos": combos})
            print("POINT", json.dumps(rows[-1]), flush=True)
        flush()

    best = min((r for r in rows if "design_obj" in r),
               key=lambda r: r["design_obj"], default=None)
    print("BEST", json.dumps(best))


if __name__ == "__main__":
    main()
