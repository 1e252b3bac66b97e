"""Airfoil dataset tests: generation, mask/offset inverse, windowing, packing."""

import numpy as np
import pytest

from cindm_tpu.data.airfoil import (
    AirfoilDataset,
    AirfoilDatasetConfig,
    boundary_coords,
    boundary_mask_offset,
    generate_airfoil_sims,
    sample_boundary_params,
)
from cindm_tpu.physics.bdim import BDIMConfig


def test_sample_boundary_params_deterministic():
    rng = np.random.default_rng(0)
    p = sample_boundary_params(rng)
    assert p["kind"] in ("ellipse", "naca")
    c = boundary_coords(p)
    assert c.shape == (40, 2)
    assert c.min() > 0 and c.max() < 64


def test_mask_offset_inverse():
    rng = np.random.default_rng(1)
    coords = boundary_coords(sample_boundary_params(rng))
    mask, offset = boundary_mask_offset(coords)
    assert mask.shape == (62, 62) and offset.shape == (62, 62, 2)
    assert mask.sum() > 10  # 40 points land in >10 distinct cells
    assert np.abs(offset).max() <= 0.5 + 1e-5
    # reconstruct: cell + 0.5 + offset ≈ some original point (reference
    # `utils.py:598-600` semantics)
    ys, xs = np.nonzero(mask)
    rec = np.stack([xs + 0.5 + offset[ys, xs, 0], ys + 0.5 + offset[ys, xs, 1]], -1)
    d = np.linalg.norm(rec[:, None, :] - coords[None, :, :], axis=-1).min(axis=1)
    assert d.max() < 0.75  # averaged offsets within a cell radius


@pytest.fixture(scope="module")
def small_sims():
    cfg = AirfoilDatasetConfig(time_stamps=40, n_warmup=10)
    bdim = BDIMConfig(n=64, cg_iters=30)
    return generate_airfoil_sims(0, 2, cfg, bdim), cfg


def test_generate_shapes(small_sims):
    data, cfg = small_sims
    assert data["fields"].shape == (2, 40, 62, 62, 3)
    assert data["boundary"].shape == (2, 40, 2)
    assert data["mask"].shape == (2, 62, 62)
    assert np.isfinite(data["fields"]).all()
    assert data["forces"].shape == (2, 40, 1, 2)


def test_dataset_windowing_and_batch(small_sims):
    data, cfg = small_sims
    ds = AirfoilDataset(data, cfg)
    assert len(ds) == ds.time_stamps_effective * 2
    w = ds.get_window(0)
    assert w["x"].shape == (2, 62, 62, 3)
    assert w["y"].shape == (4, 62, 62, 3)
    # normalized to [-1, 1]
    assert w["x"].min() >= -1 - 1e-6 and w["x"].max() <= 1 + 1e-6
    batch = ds.get_batch(np.array([0, 1]))
    assert batch["x"].shape == (2, 64, 64, 15)  # 4 frames * 3 + 3 aux
    assert batch["cond"].shape == (2, 64, 64, 6)  # 2 frames * 3
