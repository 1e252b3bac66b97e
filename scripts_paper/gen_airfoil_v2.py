"""Regenerate the 1024-sim airfoil dataset on the corrected solver (v2).

Round-3 fix: the Poisson projection now applies the Neumann edge BC the
reference MG smoother converges to (`physics/bdim.py:_update_up`); the old
cache (`dataset/airfoil_1024`) was generated with p=0 Dirichlet edges —
measured max|Δp| 3.2 on a p-range [-2.9, 4.7] — so every field/force in it
is off. All v2 sims are fresh (seed 0, 1024 boundaries), same layout as
`data/airfoil.py:generate_airfoil_sims`.
"""
import time

from cindm_tpu.data.airfoil import AirfoilDatasetConfig, generate_airfoil_sims
from cindm_tpu.physics.bdim import BDIMConfig
from cindm_tpu.utils.cache import enable_compile_cache

OUT = "dataset/airfoil_1024_v2"


def main():
    enable_compile_cache()
    acfg = AirfoilDatasetConfig(time_stamps=100, n_warmup=300)
    t0 = time.time()
    d = generate_airfoil_sims(0, 1024, acfg, BDIMConfig(), cache_dir=OUT)
    print(
        f"generated {d['fields'].shape[0]} sims in {time.time()-t0:.1f}s "
        f"-> {OUT}",
        flush=True,
    )


if __name__ == "__main__":
    main()
