"""Extend the round-2 airfoil dataset to 1024 sims (VERDICT round-2 #1).

Reuses the cached 384-sim set (seed 0) and generates 640 fresh BDIM sims
(seed 1) on-device, then concatenates into ``dataset/airfoil_1024`` with
the same array layout (`data/airfoil.py:generate_airfoil_sims`).
"""
import os
import time

import numpy as np

from cindm_tpu.data.airfoil import AirfoilDatasetConfig, generate_airfoil_sims
from cindm_tpu.physics.bdim import BDIMConfig

KEYS = ("fields", "boundary", "mask", "offset", "forces")


def main():
    acfg = AirfoilDatasetConfig(time_stamps=100, n_warmup=300)
    t0 = time.time()
    new = generate_airfoil_sims(1, 640, acfg, BDIMConfig(),
                                cache_dir="dataset/airfoil_640_s1")
    print(f"generated 640 sims in {time.time()-t0:.1f}s", flush=True)
    old = {k: np.load(f"dataset/airfoil_384/{k}.npy") for k in KEYS}
    os.makedirs("dataset/airfoil_1024", exist_ok=True)
    for k in KEYS:
        np.save(f"dataset/airfoil_1024/{k}.npy",
                np.concatenate([old[k], new[k]], axis=0))
    print("wrote dataset/airfoil_1024", flush=True)


if __name__ == "__main__":
    main()
