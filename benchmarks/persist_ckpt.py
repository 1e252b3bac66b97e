"""Snapshot the latest orbax milestone into a git-committable .npz.

Usage:
    python benchmarks/persist_ckpt.py --results_folder ./results/nbody2_coll \
        [--milestone N] [--out ./results/nbody2_coll/persisted_m{N}.npz]

Writes ``persisted_m{step}.npz`` ({params, ema_params, step} only — see
cindm_tpu/utils/persist.py) next to the checkpoints by default. Commit the
file with ``git add -f`` (results/ is gitignored); every CLI transparently
loads it on a fresh VM via the CheckpointManager fallback.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results_folder", required=True)
    ap.add_argument("--milestone", type=int, default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--model", default="nbody2",
                    choices=["nbody2", "unet2d", "force", "raw"],
                    help="model family, to build the state template: "
                         "nbody2 (TemporalUnet1D), unet2d (airfoil "
                         "diffusion Unet2D, 21ch), force (ForceUnet); "
                         "raw restores the orbax milestone WITHOUT a "
                         "template (works for any model — the 1D baseline "
                         "surrogates have four different architectures)")
    ap.add_argument("--horizon", type=int, default=24)
    ap.add_argument("--n_bodies", type=int, default=2)
    ap.add_argument("--Unet_dim", type=int, default=64)
    ap.add_argument("--ema_only", type=lambda s: s.lower() == "true", default=False,
                    help="drop the raw params copy (restored from ema_params "
                         "on load) — halves the snapshot")
    ap.add_argument("--dtype", default=None,
                    help="down-cast floating leaves, e.g. bfloat16 (halves "
                         "the snapshot again; load casts back to the "
                         "template dtype)")
    args = ap.parse_args()

    # No TPU needed to copy arrays — and a second TPU process can wedge the
    # tunnel while a trainer runs. sitecustomize registers the axon platform
    # at interpreter startup, so env vars are not enough (verify SKILL.md):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from cindm_tpu.train import CheckpointManager, TrainConfig, init_train_state, make_optimizer
    from cindm_tpu.utils.persist import save_npz

    if args.model == "raw":
        # Template-free: orbax restores the checkpoint's own pytree (plain
        # nested dicts — the same key-paths a fresh flax init produces, so
        # load_npz against a proper template consumes every key later).
        mngr = CheckpointManager(args.results_folder)
        state = mngr.load(args.milestone)
        step = int(state["step"])
        out = args.out or os.path.join(args.results_folder,
                                       f"persisted_m{step}.npz")
        dtype = None
        if args.dtype is not None:
            import ml_dtypes

            dtype = getattr(ml_dtypes, args.dtype, None) or args.dtype
        save_npz(state, out, ema_only=args.ema_only, dtype=dtype)
        print(f"persisted step {step} -> {out} "
              f"({os.path.getsize(out) / 1e6:.1f} MB)")
        return

    if args.model == "nbody2":
        from cindm_tpu.models.unet1d import TemporalUnet1D

        model = TemporalUnet1D(horizon=args.horizon,
                               transition_dim=args.n_bodies * 4,
                               dim=args.Unet_dim, attention=True)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, args.horizon, args.n_bodies * 4)),
                            jnp.zeros(1, jnp.int32))
    elif args.model == "unet2d":
        from cindm_tpu.models.unet2d import Unet2D
        from cindm_tpu.sampling import Diffusion2DConfig

        cfg = Diffusion2DConfig()
        model = Unet2D(dim=args.Unet_dim, dim_mults=(1, 2),
                       channels=cfg.channels)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, cfg.channels)),
                            jnp.zeros(1, jnp.int32))
    else:  # force
        from cindm_tpu.models.unet2d import ForceUnet

        model = ForceUnet(dim=args.Unet_dim, dim_mults=(1, 2, 4, 8))
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 4)))
    template = init_train_state(params, make_optimizer(TrainConfig()))
    mngr = CheckpointManager(args.results_folder)
    state = mngr.load(args.milestone, template=template)
    step = int(state["step"])
    out = args.out or os.path.join(args.results_folder, f"persisted_m{step}.npz")
    dtype = None
    if args.dtype is not None:
        import ml_dtypes  # bfloat16 numpy dtype (ships with jax)

        dtype = getattr(ml_dtypes, args.dtype, None) or args.dtype
    save_npz(state, out, ema_only=args.ema_only, dtype=dtype)
    print(f"persisted step {step} -> {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
