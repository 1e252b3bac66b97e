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


def test_sample_boundary_params_band():
    """Placement band is parameterizable (wide-band priors for nb>=3
    region-partition designs, round-4 diagnosis)."""
    rng = np.random.default_rng(1)
    for _ in range(32):
        p = sample_boundary_params(rng, x_band=(0.1, 0.2), y_band=(0.7, 0.9))
        assert 64 * 0.1 <= p["x"] <= 64 * 0.2
        assert 64 * 0.7 <= p["y"] <= 64 * 0.9


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


def test_device_sampler_matches_get_batch(small_sims):
    """The HBM-resident gather must reproduce get_batch exactly (same
    normalization, 62→64 pad, frame-major channel packing)."""
    import jax.numpy as jnp

    data, cfg = small_sims
    ds = AirfoilDataset(data, cfg)
    draw = ds.make_device_sampler(batch_size=2)
    # window idx 0 and 3 → (sim, time) via the same divmod as get_window
    idx = np.array([0, 3])
    sims, tids = np.divmod(idx, ds.time_stamps_effective)
    mids = tids * cfg.time_interval + ds.t_cushion_input
    got = draw.gather(draw.arrays, jnp.asarray(sims), jnp.asarray(mids))
    want = ds.get_batch(idx)
    np.testing.assert_allclose(np.asarray(got["x"]), want["x"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["cond"]), want["cond"], atol=1e-6)
    # random draws have valid shapes and stay in range
    import jax

    b = draw(draw.arrays, jax.random.PRNGKey(0))
    assert b["x"].shape == (2, 64, 64, 15) and b["cond"].shape == (2, 64, 64, 6)
    assert np.isfinite(np.asarray(b["x"])).all()


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


def test_load_reference_airfoil_dirs(tmp_path):
    """Round-trip the reference on-disk layout."""
    import os
    from cindm_tpu.data.airfoil import load_reference_airfoil_dirs

    base = tmp_path / "training_trajectories"
    rng = np.random.default_rng(0)
    for k in range(2):
        sim = base / f"sim_{k:06d}"
        os.makedirs(sim)
        for t in range(3):
            np.save(sim / f"velocity_{t:06d}.npy", rng.normal(size=(2, 62, 62)).astype(np.float32))
            np.save(sim / f"pressure_{t:06d}.npy", rng.normal(size=(62, 62)).astype(np.float32))
        np.save(sim / "boundary.npy", rng.uniform(1, 61, size=(2, 40)).astype(np.float32))
    os.makedirs(base / "boundary_mask")
    os.makedirs(base / "boundary_offset")
    for k in range(2):
        np.save(base / "boundary_mask" / f"sim_{k:06d}.npy", rng.integers(0, 2, (62 * 62,)).astype(np.float32))
        np.save(base / "boundary_offset" / f"sim_{k:06d}.npy", rng.normal(size=(62 * 62, 2)).astype(np.float32))

    data = load_reference_airfoil_dirs(str(tmp_path), n_sims=2, time_stamps=3)
    assert data["fields"].shape == (2, 3, 62, 62, 3)
    assert data["boundary"].shape == (2, 40, 2)
    assert data["mask"].shape == (2, 62, 62)
    assert data["offset"].shape == (2, 62, 62, 2)
    ds = AirfoilDataset(data, AirfoilDatasetConfig(input_steps=1, output_steps=1, time_interval=1, time_stamps=3))
    assert len(ds) > 0
