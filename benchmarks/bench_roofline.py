"""Per-op-class roofline attribution of the flagship denoiser forward
(VERDICT round-2 weak #6: 29% MFU was reported but not decomposed).

Method: rebuild each layer class of TemporalUnet1D (horizon 24, dim 64,
mults (1,2,4,8), attention) at its exact in-network shape, time each
amortized under jit at the measured-optimal fold-slice batch (5376 — see
`sampling/compose.py:FOLD_TARGET`), and compare the sum against the whole
forward. For every class, XLA's compiled cost_analysis gives FLOPs and
bytes accessed, so each class gets an arithmetic-intensity verdict against
the v5e ridge point (197 TFLOP/s bf16 ÷ 819 GB/s ≈ 240 FLOP/B).

Output: one JSON dict per op class + a whole-model line.
"""
from __future__ import annotations

import sys as _sys, os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

from cindm_tpu.models import TemporalUnet1D
from cindm_tpu.models.blocks import (
    Conv1d,
    Conv1dBlock,
    Downsample1d,
    LinearAttentionTemporal,
    PreNormResidual,
    ResidualTemporalBlock,
    Upsample1d,
)
from cindm_tpu.utils.cache import enable_compile_cache

V5E_PEAK_FLOPS = 197e12
V5E_HBM_BPS = 819e9
RIDGE = V5E_PEAK_FLOPS / V5E_HBM_BPS  # ~240 FLOP/byte

B = 5376  # measured-optimal fold slice (RESULTS.md batch-512 cliff fix)
DIM = 64
T_EMB = DIM


def timed(fn, *args, iters=30, warmup=3):
    f = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    c = f.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get("flops", 0.0))
    bytes_ = float(c.get("bytes accessed", 0.0))
    return dt, flops, bytes_


def main():
    enable_compile_cache()
    rows = []

    def dump(extra=None):
        # partial write after every class: a hard-killed run keeps its rows
        out = {"parts": rows}
        if extra:
            out.update(extra)
        with open("results/roofline.json", "w") as f:
            json.dump(out, f, indent=1)

    # Stage geometry for horizon 24, mults (1,2,4,8): down flags (T,T,T,F)
    # → resolutions 24, 12, 6, 3 (`models/unet1d.py:_stage_flags`).
    # Down path blocks: (24,8→64)(24,64→64) | (12,64→128)(12,128) |
    # (6,128→256)(6,256) | (3,256→512)(3,512); mid: 2×(3,512);
    # up: (3,512+512→512... ) — measure each ResidualTemporalBlock at its
    # true (T, C_in) with its C_out via separate instances.
    res_blocks = [  # (T, C_in, C_out)
        (24, 8, 64), (24, 64, 64),
        (12, 64, 128), (12, 128, 128),
        (6, 128, 256), (6, 256, 256),
        (3, 256, 512), (3, 512, 512),
        (3, 512, 512), (3, 512, 512),            # mid
        (3, 1024, 512), (3, 512, 256),           # up stage 0 (skip concat)
        (6, 512, 256), (6, 256, 128),            # up stage 1
        (12, 256, 128), (12, 128, 64),           # up stage 2
    ]
    t_dt = t_fl = t_by = 0.0
    for (t_len, c_in, c_out) in res_blocks:
        print(f"# timing RTB T={t_len} {c_in}->{c_out}", flush=True)
        mod = ResidualTemporalBlock(c_out)
        x = jnp.zeros((B, t_len, c_in), jnp.float32)
        temb = jnp.zeros((B, T_EMB), jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x, temb)
        dt, fl, by = timed(lambda x, e: mod.apply(params, x, e), x, temb)
        t_dt += dt; t_fl += fl; t_by += by
    rec = {"class": "ResidualTemporalBlock(conv5+GN+Mish)", "count": 1,
           "ms_per_fwd_total": round(t_dt * 1e3, 3),
           "gflops_total": round(t_fl / 1e9, 2),
           "mb_accessed_total": round(t_by / 1e6, 1),
           "arith_intensity": round(t_fl / max(t_by, 1.0), 1),
           "bound": "compute" if t_fl / max(t_by, 1.0) > RIDGE else "bytes"}
    rows.append(rec); print(json.dumps(rec), flush=True); dump()

    attn_shapes = [(24, 64), (12, 128), (6, 256), (3, 512), (3, 512),
                   (3, 512), (6, 256), (12, 128)]
    t_dt = t_fl = t_by = 0.0
    for (t_len, c) in attn_shapes:
        print(f"# timing attn T={t_len} C={c}", flush=True)
        mod = PreNormResidual(c, LinearAttentionTemporal(c))
        x = jnp.zeros((B, t_len, c), jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        dt, fl, by = timed(lambda x: mod.apply(params, x), x)
        t_dt += dt; t_fl += fl; t_by += by
    rec = {"class": "LinearAttention(block-dense)", "count": 1,
           "ms_per_fwd_total": round(t_dt * 1e3, 3),
           "gflops_total": round(t_fl / 1e9, 2),
           "mb_accessed_total": round(t_by / 1e6, 1),
           "arith_intensity": round(t_fl / max(t_by, 1.0), 1),
           "bound": "compute" if t_fl / max(t_by, 1.0) > RIDGE else "bytes"}
    rows.append(rec); print(json.dumps(rec), flush=True); dump()

    updown = [("down", Downsample1d(64), (24, 64)),
              ("down", Downsample1d(128), (12, 128)),
              ("down", Downsample1d(256), (6, 256)),
              ("up", Upsample1d(256), (3, 256)),
              ("up", Upsample1d(128), (6, 128)),
              ("up", Upsample1d(64), (12, 64))]
    t_dt = t_fl = t_by = 0.0
    for (_, mod, (t_len, c)) in updown:
        print(f"# timing resample T={t_len} C={c}", flush=True)
        x = jnp.zeros((B, t_len, c), jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        dt, fl, by = timed(lambda x: mod.apply(params, x), x)
        t_dt += dt; t_fl += fl; t_by += by
    rec = {"class": "Down/Upsample convs", "count": 1,
           "ms_per_fwd_total": round(t_dt * 1e3, 3),
           "gflops_total": round(t_fl / 1e9, 2),
           "mb_accessed_total": round(t_by / 1e6, 1),
           "arith_intensity": round(t_fl / max(t_by, 1.0), 1),
           "bound": "compute" if t_fl / max(t_by, 1.0) > RIDGE else "bytes"}
    rows.append(rec); print(json.dumps(rec), flush=True); dump()

    # final head: Conv1dBlock(64, k5) at (24, 64→... wait input is 64) + 1x1
    for name, mod, shape in [("final Conv1dBlock+1x1",
                              Conv1dBlock(64, kernel_size=5), (24, 64))]:
        x = jnp.zeros((B,) + (shape[0], shape[1]), jnp.float32)
        params = mod.init(jax.random.PRNGKey(0), x)
        dt, fl, by = timed(lambda x: mod.apply(params, x), x)
        rec = {"class": name, "count": 1,
               "ms_per_fwd_total": round(dt * 1e3, 3),
               "gflops_total": round(fl / 1e9, 2),
               "mb_accessed_total": round(by / 1e6, 1),
               "arith_intensity": round(fl / max(by, 1.0), 1),
               "bound": "compute" if fl / max(by, 1.0) > RIDGE else "bytes"}
        rows.append(rec); print(json.dumps(rec), flush=True); dump()

    # whole model at the same fold-slice batch
    print("# timing whole model", flush=True)
    model = TemporalUnet1D(horizon=24, transition_dim=8, dim=DIM, attention=True)
    x = jnp.zeros((B, 24, 8), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    dt, fl, by = timed(lambda x, t: model.apply(params, x, t), x, t)
    whole = {
        "class": "WHOLE TemporalUnet1D fwd", "batch": B,
        "ms_per_fwd": round(dt * 1e3, 3),
        "gflops": round(fl / 1e9, 2),
        "mb_accessed": round(by / 1e6, 1),
        "arith_intensity": round(fl / max(by, 1.0), 1),
        "mfu": round(fl / dt / V5E_PEAK_FLOPS, 4),
        "hbm_util": round(by / dt / V5E_HBM_BPS, 4),
        "sum_of_parts_ms": round(sum(r["ms_per_fwd_total"] for r in rows), 3),
    }
    print(json.dumps(whole), flush=True); dump({"whole": whole})

    # bf16 body for reference (RESULTS.md round-2: no uplift expected — f32
    # matmuls already ride the bf16 MXU path; this documents whether the
    # BYTES side moves, which would point at activation traffic)
    from cindm_tpu.ops import bf16_eps_model

    eps16 = bf16_eps_model(model.apply, params)
    dt16, fl16, by16 = timed(lambda x, t: eps16(x, t), x, t)
    whole16 = {
        "class": "WHOLE TemporalUnet1D fwd (bf16 body)", "batch": B,
        "ms_per_fwd": round(dt16 * 1e3, 3),
        "gflops": round(fl16 / 1e9, 2),
        "mb_accessed": round(by16 / 1e6, 1),
        "mfu": round(fl / dt16 / V5E_PEAK_FLOPS, 4),  # f32-equivalent FLOPs
        "hbm_util": round(by16 / dt16 / V5E_HBM_BPS, 4),
    }
    print(json.dumps(whole16), flush=True)
    dump({"whole": whole, "whole_bf16": whole16})


if __name__ == "__main__":
    main()
