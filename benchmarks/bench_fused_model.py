"""Whole-model verdict for the fused-RTB megakernel: TemporalUnet1D
forward via plain `model.apply` (XLA's own cross-layer fusion) vs
`models.fused_apply.temporal_unet1d_fused_apply` (eligible RTBs in one
Pallas kernel each), at the flagship fold-slice shapes.

The isolated-block bench (`bench_fused_rtb.py`) can over- or under-state
the wired-in effect: XLA fuses ACROSS layer boundaries in the full graph,
so the only number that justifies wiring the kernel into the samplers is
this one.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, json, time
import jax, jax.numpy as jnp

from cindm_tpu.models.unet1d import TemporalUnet1D
from cindm_tpu.models.fused_apply import temporal_unet1d_fused_apply
from cindm_tpu.utils.cache import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5376)
    ap.add_argument("--horizon", type=int, default=24)
    ap.add_argument("--transition_dim", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--tiles", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--out", default="./results/fused_model_bench.json")
    args = ap.parse_args()
    enable_compile_cache()

    model = TemporalUnet1D(args.horizon, args.transition_dim, dim=args.dim)
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch, args.horizon, args.transition_dim))
    t = jnp.full((args.batch,), 500.0)
    variables = model.init(jax.random.PRNGKey(1), x[:2], t[:2])

    def timed(f):
        g = jax.jit(f)
        jax.block_until_ready(g(x, t))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = g(x, t)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters, out

    tx, rx = timed(lambda x, t: model.apply(variables, x, t))
    rows = [{"path": "xla", "ms": round(tx * 1e3, 3)}]
    print(json.dumps(rows[-1]), flush=True)

    best = (float("inf"), None)
    for tile in args.tiles:
        if args.batch % tile:
            continue
        try:
            tp, rp = timed(lambda x, t: temporal_unet1d_fused_apply(
                model, variables, x, t, batch_tile=tile))
        except Exception as e:
            print(f"tile {tile} failed: {type(e).__name__}: {e}", flush=True)
            continue
        err = float(jnp.max(jnp.abs(rx - rp)))
        rows.append({"path": f"fused(tile={tile})", "ms": round(tp * 1e3, 3),
                     "speedup": round(tx / tp, 3), "maxerr": err})
        print(json.dumps(rows[-1]), flush=True)
        if tp < best[0]:
            best = (tp, tile)

    summary = {"xla_ms": round(tx * 1e3, 3),
               "best_fused_ms": round(best[0] * 1e3, 3),
               "best_tile": best[1],
               "model_speedup": round(tx / best[0], 3),
               "batch": args.batch}
    print(json.dumps(summary), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "summary": summary}, f, indent=1)


if __name__ == "__main__":
    main()
