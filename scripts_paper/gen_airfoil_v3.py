"""Generate the WIDE-BAND (v3) 1024-sim airfoil dataset, chunked + resumable.

Round-4 diagnosis (RESULTS.md round 4): nb=3 region-partition designs
fragment because every training boundary sits in y ∈ [0.4, 0.6]·H — three
stacked regions necessarily push masks outside the prior's support. The fix
under test is position diversity: same solver/config as v2 but boundaries
sampled from y ∈ [0.2, 0.8]·H (`--y_band 0.2 0.8` on the train CLIs must
match). Reference analogue: the LilyPad configs place bodies across the
domain (`LilyPad.pde:110-126`), not in a 0.2H-tall band.

Unlike `gen_airfoil_v2.py` (one 55-min device call, no output — a
log-silence watchdog kills it), this generates in 64-sim chunks with a
heartbeat print per chunk and a per-chunk .npz cache, so a killed run
resumes from the last finished chunk. Final assembly writes the
`{fields,boundary,mask,offset,forces}.npy` layout
`data/airfoil.py:generate_airfoil_sims` expects, atomically.
"""
import os
import time

import numpy as np

from cindm_tpu.data.airfoil import AirfoilDatasetConfig, generate_airfoil_sims
from cindm_tpu.physics.bdim import BDIMConfig
from cindm_tpu.utils.cache import enable_compile_cache

OUT = "dataset/airfoil_1024_v3"
KEYS = ("fields", "boundary", "mask", "offset", "forces")
N_SIMS = 1024
CHUNK = 64


def main():
    if os.path.exists(os.path.join(OUT, "fields.npy")):
        print("v3 cache already complete", flush=True)
        return
    enable_compile_cache()
    os.makedirs(os.path.join(OUT, "chunks"), exist_ok=True)
    acfg = AirfoilDatasetConfig(time_stamps=100, n_warmup=300, y_band=(0.2, 0.8))
    t0 = time.time()
    for c0 in range(0, N_SIMS, CHUNK):
        p = os.path.join(OUT, "chunks", f"c{c0:04d}.npz")
        if os.path.exists(p):
            print(f"chunk {c0}: cached", flush=True)
            continue
        # seed per chunk -> identical boundaries regardless of resume point
        d = generate_airfoil_sims(1000 + c0, CHUNK, acfg, BDIMConfig(), cache_dir=None)
        tmp = p + ".tmp.npz"
        np.savez(tmp, **{k: d[k] for k in KEYS})
        os.replace(tmp, p)
        print(
            f"chunk {c0}: {CHUNK} sims done @ {time.time() - t0:.0f}s total",
            flush=True,
        )
    for k in KEYS:
        arrs = []
        for c0 in range(0, N_SIMS, CHUNK):
            with np.load(os.path.join(OUT, "chunks", f"c{c0:04d}.npz")) as z:
                arrs.append(z[k])
        out = np.concatenate(arrs)
        del arrs
        tmp = os.path.join(OUT, f"{k}.tmp.npy")
        np.save(tmp, out)
        os.replace(tmp, os.path.join(OUT, f"{k}.npy"))
        print(f"assembled {k}: {out.shape}", flush=True)
        del out
    print(f"v3 dataset complete in {time.time() - t0:.0f}s -> {OUT}", flush=True)


if __name__ == "__main__":
    main()
