"""Attribute the 2D train step's wall time (round-3: measured ~12.4 opt
steps/s at batch 48 with the 1024-sim device dataset — ~80 ms/step for a
3.1M-param Unet2D, far above the bytes/FLOPs bound; this decomposes it).

Pieces timed separately under jit, amortized over many launches:
  draw        device-sampler gather alone ([B,6] row gather + transpose)
  fwd         denoiser forward on a drawn batch
  loss        p_losses_2d (q_sample + forward + weighted MSE)
  step        full optimizer step (grad + adam + EMA), steps_per_launch 1
  step_k      steps_per_launch 25, per-step time
Each with remat on and off. XLA cost_analysis gives FLOPs/bytes per piece
so every line carries a roofline verdict (v5e: 197 TFLOP/s bf16, 819 GB/s).

Run: python benchmarks/bench_train2d_prof.py [--n_sims 1024 --batch 48]
"""
from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9


def timed(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def cost(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_sims", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--data_cache", default="dataset/airfoil_1024")
    args = ap.parse_args()

    from cindm_tpu.core import make_schedule
    from cindm_tpu.data.airfoil import AirfoilConfig, AirfoilDataset, generate_airfoil_sims
    from cindm_tpu.models.unet2d import Unet2D
    from cindm_tpu.physics.bdim import BDIMConfig
    from cindm_tpu.sampling.diffusion2d import Diffusion2DConfig, p_losses_2d
    from cindm_tpu.train.trainer import (
        TrainConfig, init_train_state, make_optimizer, make_train_step_from_loss,
    )
    from cindm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    acfg = AirfoilConfig(time_interval=4, time_stamps=100, n_warmup=300)
    data = generate_airfoil_sims(42, args.n_sims, acfg, BDIMConfig(),
                                 cache_dir=args.data_cache)
    ds = AirfoilDataset(data, acfg)
    cfg = Diffusion2DConfig(frames=6, cond_frames=2, pred_frames=4,
                            timesteps=1000)
    sched = make_schedule(cfg.timesteps, cfg.beta_schedule)
    draw = ds.make_device_sampler(args.batch)
    arrays = draw.arrays
    key = jax.random.PRNGKey(0)

    jd = jax.jit(draw)
    t_draw = timed(jd, arrays, key)
    f_draw, b_draw = cost(draw, arrays, key)
    print(json.dumps({"piece": "draw", "ms": round(t_draw * 1e3, 3),
                      "flops": f_draw, "bytes": b_draw,
                      "bound_ms": round(max(f_draw / PEAK_FLOPS,
                                            b_draw / PEAK_BYTES) * 1e3, 3)}),
          flush=True)
    batch = jd(arrays, key)

    for remat in (True, False):
        model = Unet2D(dim=64, dim_mults=(1, 2), channels=cfg.channels,
                       remat=remat)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 64, 64, cfg.channels)),
                            jnp.zeros(1, jnp.int32))
        tag = "remat" if remat else "noremat"

        fwd = lambda p, b: model.apply(p, b["x"],
                                       jnp.zeros(args.batch, jnp.int32))
        jf = jax.jit(fwd)
        t_f = timed(jf, params, batch)
        ff, bf = cost(fwd, params, batch)
        print(json.dumps({"piece": f"fwd_{tag}", "ms": round(t_f * 1e3, 3),
                          "flops": ff, "bytes": bf,
                          "bound_ms": round(max(ff / PEAK_FLOPS,
                                                bf / PEAK_BYTES) * 1e3, 3)}),
              flush=True)

        def loss_fn(p, arr, k):
            kb, kl = jax.random.split(k)
            b = draw(arr, kb)
            eps = lambda x, t: model.apply(p, x, t)
            return p_losses_2d(cfg, sched, eps, b["x"], b["cond"], kl)

        jl = jax.jit(jax.value_and_grad(loss_fn))
        t_l = timed(jl, params, arrays, key)
        fl, bl = cost(jax.value_and_grad(loss_fn), params, arrays, key)
        print(json.dumps({"piece": f"grad_{tag}", "ms": round(t_l * 1e3, 3),
                          "flops": fl, "bytes": bl,
                          "bound_ms": round(max(fl / PEAK_FLOPS,
                                                bl / PEAK_BYTES) * 1e3, 3)}),
              flush=True)

        tcfg = TrainConfig()
        state = init_train_state(params, make_optimizer(tcfg))
        for spl in (1, 25):
            step = make_train_step_from_loss(loss_fn, tcfg,
                                             steps_per_launch=spl,
                                             broadcast_batch=True)
            st = state
            def run(st, k):
                s2, l = step(st, arrays, k)
                return l
            t_s = timed(lambda k: run(st, k), key,
                        n=(20 if spl == 1 else 2), warmup=1)
            print(json.dumps({"piece": f"step_{tag}_spl{spl}",
                              "ms_per_step": round(t_s * 1e3 / spl, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
