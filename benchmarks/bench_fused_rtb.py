"""Fused-RTB Pallas megakernel vs XLA, at the in-network flagship shapes.

The round-4 roofline (`results/roofline.json`) found every layer class of
the 1D denoiser bandwidth-bound and named a VMEM-resident cross-layer
kernel as the remaining lever. This bench gives that hypothesis a measured
verdict at the ResidualTemporalBlock granularity: for each Pallas-eligible
(T, C_in, C_out) the flagship TemporalUnet1D actually runs
(`bench_roofline.py` shape table), time the Flax module (XLA's own fusion)
against `ops.fused_rtb` (whole block in one pallas_call), identical
parameters and numerics.

Output: one line per shape + a totals line; positive speedup>1 means the
megakernel direction is worth wiring into the model.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time, json
import jax, jax.numpy as jnp

from cindm_tpu.models.blocks import ResidualTemporalBlock, mish
from cindm_tpu.ops.fused_rtb import fused_rtb
from cindm_tpu.utils.cache import enable_compile_cache

B = 5376  # measured-optimal fold slice (RESULTS.md batch-512 cliff fix)
T_EMB = 64

# Pallas-eligible subset of bench_roofline's res_blocks (C_in, C_out % 128):
SHAPES = [
    (12, 128, 128), (6, 128, 256), (6, 256, 256), (3, 256, 512),
    (3, 512, 512), (3, 512, 512), (3, 512, 512),   # down tail + mid
    (3, 1024, 512), (3, 512, 256),                  # up stage 0
    (6, 512, 256), (6, 256, 128), (12, 256, 128),   # up stages 1-2
]


def params_to_args(p):
    a = dict(
        w1=p["Conv1dBlock_0"]["Conv1d_0"]["Conv_0"]["kernel"],
        b1=p["Conv1dBlock_0"]["Conv1d_0"]["Conv_0"]["bias"],
        gs1=p["Conv1dBlock_0"]["GroupNorm_0"]["GroupNorm_0"]["scale"],
        gb1=p["Conv1dBlock_0"]["GroupNorm_0"]["GroupNorm_0"]["bias"],
        w2=p["Conv1dBlock_1"]["Conv1d_0"]["Conv_0"]["kernel"],
        b2=p["Conv1dBlock_1"]["Conv1d_0"]["Conv_0"]["bias"],
        gs2=p["Conv1dBlock_1"]["GroupNorm_0"]["GroupNorm_0"]["scale"],
        gb2=p["Conv1dBlock_1"]["GroupNorm_0"]["GroupNorm_0"]["bias"],
    )
    if "Conv1d_0" in p:
        a["wres"] = p["Conv1d_0"]["Conv_0"]["kernel"][0]
        a["bres"] = p["Conv1d_0"]["Conv_0"]["bias"]
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=B)
    ap.add_argument("--tiles", type=int, nargs="+", default=[32, 128])
    ap.add_argument("--n_inner", type=int, default=30)
    ap.add_argument("--out", default="./results/fused_rtb_bench.json")
    args = ap.parse_args()
    enable_compile_cache()
    N = args.n_inner
    rows, tot_x, tot_best = [], 0.0, 0.0

    for (t_len, c_in, c_out) in SHAPES:
        mod = ResidualTemporalBlock(c_out)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (args.batch, t_len, c_in)) * 0.1
        t_emb = jax.random.normal(jax.random.PRNGKey(1), (args.batch, T_EMB))
        params = mod.init(jax.random.PRNGKey(2), x, t_emb)
        p = params["params"]
        ka = params_to_args(p)
        dk = p["Dense_0"]["Dense_0"]

        def chain(step):
            @jax.jit
            def run(x):
                def body(h, _):
                    o = step(h)
                    if o.shape[-1] < h.shape[-1]:
                        o = jnp.concatenate([o, o], -1)[..., : h.shape[-1]]
                    return o[..., : h.shape[-1]] * 0.5 + h * 0.5, None
                h, _ = jax.lax.scan(body, x, None, length=N)
                return h
            return run

        xla_step = lambda h: mod.apply(params, h, t_emb)

        def pal_step_for(tile):
            temb = mish(t_emb) @ dk["kernel"] + dk["bias"]
            return lambda h: fused_rtb(h, temb, **ka, batch_tile=tile)

        # correctness once per shape (first eligible tile)
        r1 = jax.jit(xla_step)(x)
        p1 = jax.jit(pal_step_for(args.tiles[0]))(x)
        err = float(jnp.max(jnp.abs(r1 - p1)))

        fx = chain(xla_step)
        fx(x).block_until_ready()
        t0 = time.perf_counter(); fx(x).block_until_ready()
        tx = (time.perf_counter() - t0) / N

        best_tp, best_tile = float("inf"), None
        for tile in args.tiles:
            if args.batch % tile:
                continue
            fp = chain(pal_step_for(tile))
            try:
                fp(x).block_until_ready()
                t0 = time.perf_counter(); fp(x).block_until_ready()
                tp = (time.perf_counter() - t0) / N
            except Exception as e:  # VMEM overflow etc. — record and move on
                print(f"  tile {tile} failed: {type(e).__name__}", flush=True)
                continue
            if tp < best_tp:
                best_tp, best_tile = tp, tile
        rec = {"shape": [t_len, c_in, c_out], "xla_ms": round(tx * 1e3, 3),
               "pallas_ms": round(best_tp * 1e3, 3), "tile": best_tile,
               "speedup": round(tx / best_tp, 2), "maxerr": err}
        rows.append(rec); print(json.dumps(rec), flush=True)
        tot_x += tx; tot_best += min(best_tp, tx)

    summary = {"total_xla_ms": round(tot_x * 1e3, 2),
               "total_best_ms": round(tot_best * 1e3, 2),
               "net_speedup_if_wired": round(tot_x / tot_best, 3),
               "batch": args.batch}
    print(json.dumps(summary), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
