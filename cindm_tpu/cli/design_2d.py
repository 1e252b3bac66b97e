"""design_2d — multi-airfoil guided inverse design CLI.

Mirrors `inference/inverse_design_2d.py:37-82` flags: loads the airfoil
diffusion + ForceUnet surrogate, samples num_boundaries designs with
"standard-alpha" guidance, post-processes masks to polygons, rejects
overlaps, and (closed loop) scores lift/drag by re-simulating with the
on-device BDIM solver — replacing the reference's boundary-txt → LilyPad
(Java) → force-txt pipeline (`inverse_design_2d.py:261-342` + E5).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def make_region_bands(H: int, W: int, nb: int,
                      lo_frac: float = 0.0, hi_frac: float = 1.0) -> jnp.ndarray:
    """[nb, H, W] per-boundary horizontal bands with 2-cell gaps: boundary k
    may only place mask inside its band (zero-inpainted elsewhere at every
    reverse step — see p_sample_loop_2d region_mask). The [lo_frac, hi_frac)
    range should be the prior's training placement band so every band lies
    inside the model's position support."""
    rows = jnp.arange(H)[:, None] * jnp.ones((1, W))
    r_lo, r_hi = lo_frac * H, hi_frac * H
    span = (r_hi - r_lo) / nb
    bands = []
    for k in range(nb):
        lo, hi = r_lo + k * span + 2, r_lo + (k + 1) * span - 2
        bands.append(((rows >= lo) & (rows < hi)).astype(jnp.float32))
    return jnp.stack(bands)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Multi-airfoil inverse design (TPU)")
    p.add_argument("--model_path", default="./results/airfoil")
    p.add_argument("--force_model_path", default=None)
    p.add_argument("--milestone", type=int, default=None)
    p.add_argument("--num_boundaries", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--design_guidance", default="standard-alpha")
    p.add_argument("--coeff_ratio", type=float, default=2e-4)
    p.add_argument("--lambda_force", type=float, default=1.0)
    p.add_argument("--lambda_overlap", type=float, default=1.0)
    p.add_argument("--lambda_separation", type=float, default=0.0,
                   help="symmetry-breaking ablation: weight of the pairwise "
                        "mask-centroid separation term (pushes nb>=2 "
                        "boundaries APART instead of shrinking them like "
                        "the overlap penalty)")
    p.add_argument("--region_band", type=float, nargs=2, default=[0.0, 1.0],
                   help="fractional y-range [lo, hi) that --region_partition "
                        "splits into per-boundary bands; set to the prior's "
                        "training placement band (--y_band at train time) so "
                        "every band lies inside the model's position support "
                        "(the round-4 nb=3 fragmentation mechanism)")
    p.add_argument("--region_partition", default="none", choices=["none", "y"],
                   help="'y' assigns each boundary a horizontal band (2-cell "
                        "gaps) and inpaints its mask to zero outside it every "
                        "step — non-overlap by construction, design free "
                        "inside the band (see p_sample_loop_2d region_mask)")
    p.add_argument("--station_until", type=int, default=0,
                   help="q-sample-inpaint per-boundary proto-mask blobs at "
                        "staggered stations into the mask channel while "
                        "t >= this value, then release (breaks the nb>=2 "
                        "collapse the x_T-bias/separation-penalty ablations "
                        "cannot — see p_sample_loop_2d docstring); 0 = off")
    p.add_argument("--init_sep", type=float, default=0.0,
                   help="symmetry-breaking ablation: amplitude of per-"
                        "boundary Gaussian bumps added to the mask channel "
                        "of x_T at staggered streamwise positions (0 = off)")
    p.add_argument("--share_noise", type=lambda s: s == "True", default=True)
    p.add_argument("--timesteps", type=int, default=1000)
    p.add_argument("--ddim_steps", type=int, default=0,
                   help="> 0: guided DDIM with this many reverse steps "
                        "instead of the full-T ancestral loop")
    p.add_argument("--p_min", type=float, default=-1.0)
    p.add_argument("--p_max", type=float, default=1.0)
    p.add_argument("--evaluate", type=lambda s: s == "True", default=True)
    p.add_argument("--n_warmup", type=int, default=300,
                   help="BDIM warmup steps before force recording; the "
                        "reference scores t=300..400 (`LilyPad.pde:143-180`)")
    p.add_argument("--n_record", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--host_chunks", type=int, default=10)
    p.add_argument("--n_devices", type=int, default=0,
                   help="shard the (batch·num_boundaries) sampling axis "
                        "over a data mesh of this many chips (0 = single)")
    p.add_argument("--dump_raw", default=None,
                   help="save the raw sampled tensor to this .npy for "
                        "offline post-processing analysis")
    return p


def main(argv=None):
    from ..utils.heartbeat import start_heartbeat

    start_heartbeat()  # log-liveness under the queue watchdog
    from ..core import make_schedule
    from ..models.unet2d import ForceUnet, Unet2D
    from ..sampling.diffusion2d import Diffusion2DConfig, p_sample_loop_2d
    from ..sampling.guidance2d import make_design_grad_fn, mask_denoise
    from ..train import CheckpointManager, TrainConfig, init_train_state, make_optimizer
    from ..utils import evaluate_designs, polygons_overlap, reconstruct_boundary

    from ..utils.cache import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    cfg = Diffusion2DConfig(timesteps=args.timesteps, coeff_ratio=args.coeff_ratio,
                            share_noise=args.share_noise)
    model = Unet2D(dim=64, dim_mults=(1, 2), channels=cfg.channels)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, cfg.channels)), jnp.zeros(1, jnp.int32)
    )
    mngr = CheckpointManager(args.model_path)
    template = init_train_state(params, make_optimizer(TrainConfig()))
    state = mngr.load(args.milestone, template=template)
    params = state["ema_params"]

    fm = ForceUnet(dim=64, dim_mults=(1, 2, 4, 8))
    fkey = jax.random.PRNGKey(1)
    fparams = fm.init(fkey, jnp.zeros((1, 64, 64, 4)))
    if args.force_model_path:
        fmngr = CheckpointManager(args.force_model_path)
        fstate = fmngr.load(template=init_train_state(fparams, make_optimizer(TrainConfig())))
        fparams = fstate["ema_params"]
    force_model = lambda x: fm.apply(fparams, x)

    design_fn = make_design_grad_fn(
        force_model, args.batch_size, args.num_boundaries, cfg.frames,
        args.p_min, args.p_max, args.lambda_force, args.lambda_overlap,
        lambda_separation=args.lambda_separation,
    )
    init_bias = None
    station_pattern = None
    if (args.init_sep > 0.0 or args.station_until > 0) and args.num_boundaries > 1:
        # per-boundary Gaussian bump in the mask channel, centers staggered
        # along the flow (x) axis — asymmetric-init ablation (VERDICT r2 #1)
        H = W = cfg.image_size
        nb = args.num_boundaries
        yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
        # stations staggered along Y (cross-flow) INSIDE the training
        # position band (sample_boundary_params: x∈[0.25,0.45]W,
        # y∈[0.4,0.6]H — airfoils x-separated in-band cannot avoid overlap
        # at chord 13-22 cells, and out-of-band stations get pulled back
        # into the band after release and merge). Blobs are anisotropic
        # (airfoil-like, longer along the flow).
        cx = 0.35 * W
        if args.region_partition == "y" and nb > 1:
            # stations at the REGION-BAND centers: each boundary's nucleus
            # lands inside its own band, so the region zero-inpaint cannot
            # starve it (round-5 nb=3 finding: region partition alone left
            # exactly one of three 12-px bands empty — `mask px 0` — the
            # prior nucleates at most two sites that far apart on its own)
            lo, hi = args.region_band
            span = (hi - lo) / nb
            centers_y = jnp.array(
                [(lo + (k + 0.5) * span) * H for k in range(nb)]
            )
            sy = max(2.0, 0.3 * span * H)
        elif nb > 1:
            centers_y = jnp.linspace(0.4 * H, 0.6 * H, nb)
            sy = 0.35 * float(centers_y[1] - centers_y[0])
        else:
            centers_y = jnp.array([0.5 * H])
            sy = 4.0
        sx = 2.5 * sy
        bumps = jnp.exp(
            -((xx[None] - cx) ** 2) / (2 * sx * sx)
            - ((yy[None] - centers_y[:, None, None]) ** 2) / (2 * sy * sy)
        )  # [nb, H, W]
        if args.init_sep > 0.0:
            bias = jnp.zeros((args.batch_size, nb, H, W, cfg.channels))
            bias = bias.at[..., -3].set(args.init_sep * bumps[None])
            init_bias = bias.reshape(args.batch_size * nb, H, W, cfg.channels)
        if args.station_until > 0:
            # binary proto-mask blobs (data units [0,1]) held through the
            # high-noise phase via q-sample inpainting — see
            # p_sample_loop_2d(station_pattern=...)
            blobs = (bumps > jnp.exp(-0.5)).astype(jnp.float32)  # radius ≈ s
            station_pattern = jnp.broadcast_to(
                blobs[None], (args.batch_size, nb, H, W)
            ).reshape(args.batch_size * nb, H, W)
    region_mask = None
    if args.region_partition == "y" and args.num_boundaries > 1:
        H = W = cfg.image_size
        region_mask = jnp.broadcast_to(
            make_region_bands(H, W, args.num_boundaries,
                              *args.region_band)[None],
            (args.batch_size, args.num_boundaries, H, W),
        ).reshape(args.batch_size * args.num_boundaries, H, W)
    sched = make_schedule(cfg.timesteps, cfg.beta_schedule)
    eps = lambda x, t: model.apply(params, x, t)
    mesh = None
    if args.n_devices > 0:
        from ..parallel import make_mesh

        if (args.batch_size * args.num_boundaries) % args.n_devices:
            raise SystemExit("batch_size * num_boundaries must be a "
                             "multiple of --n_devices")
        mesh = make_mesh(args.n_devices, ("data",))
    if args.ddim_steps > 0:
        # working guided DDIM (the reference's 2D DDIM is unreachable for
        # design, `model/diffusion_2d.py:909-963`); S < T reverse steps
        from ..sampling.diffusion2d import ddim_sample_loop_2d

        out = ddim_sample_loop_2d(
            cfg, sched, eps, jax.random.PRNGKey(args.seed),
            batch=args.batch_size, num_boundaries=args.num_boundaries,
            sampling_timesteps=args.ddim_steps, design_fn=design_fn,
            design_guidance=args.design_guidance, init_bias=init_bias,
        )
    else:
        out = p_sample_loop_2d(
            cfg, sched, eps, jax.random.PRNGKey(args.seed),
            batch=args.batch_size, num_boundaries=args.num_boundaries,
            design_fn=design_fn, design_guidance=args.design_guidance,
            host_chunks=args.host_chunks, mesh=mesh, init_bias=init_bias,
            station_pattern=station_pattern,
            station_until=args.station_until,
            region_mask=region_mask,
            progress=True,
        )
    # post-process: mask → polygons, reject overlapping designs
    out_np = np.asarray(out)
    if args.dump_raw:
        np.save(args.dump_raw, out_np)
    results = []
    fail = {"overlap": 0, "n_polys": 0}
    for b in range(args.batch_size):
        masks = np.asarray(mask_denoise(out_np[b, :, :62, :62, -3]))
        if args.num_boundaries > 1 and polygons_overlap(masks):
            fail["overlap"] += 1
            continue
        polys = []
        for k in range(args.num_boundaries):
            ps = reconstruct_boundary(masks[k], out_np[b, k, :62, :62, -2:])
            if len(ps) != 1:
                print(f"sample {b} boundary {k}: {len(ps)} polygons "
                      f"(mask px {int(masks[k].sum())})")
                fail["n_polys"] += 1
                break
            polys.append(ps[0])
        if len(polys) == args.num_boundaries:
            results.append(polys)
    print(f"valid designs: {len(results)}/{args.batch_size} (rejected: {fail})")

    record = {"valid_designs": len(results), "batch_size": args.batch_size,
              "num_boundaries": args.num_boundaries,
              "lambda_overlap": args.lambda_overlap,
              "lambda_separation": args.lambda_separation,
              "init_sep": args.init_sep, "station_until": args.station_until,
              "region_partition": args.region_partition,
              "ddim_steps": args.ddim_steps}
    if args.evaluate and results:
        # pad polygons to a fixed point count for batching
        M = max(len(p) for polys in results for p in polys)
        batchpolys = np.stack([
            np.stack([np.pad(p, ((0, M - len(p)), (0, 0)), mode="edge") for p in polys])
            for polys in results
        ])
        scores = evaluate_designs(batchpolys, n_warmup=args.n_warmup, n_record=args.n_record)
        record.update({k: v for k, v in scores.items()
                       if np.ndim(v) == 0})
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
