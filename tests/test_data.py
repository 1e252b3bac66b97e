"""Windowing-arithmetic tests for the n-body dataset."""

import numpy as np

from cindm_tpu.data.nbody import NBodyDataset, NBodyDatasetConfig


def _fake_data(n_sims=3, n_steps=1000, n=2):
    # encode (sim, step) into the values so windows are checkable
    data = np.zeros((n_sims, n_steps, n, 4), np.float32)
    steps = np.arange(n_steps, dtype=np.float32)
    data[..., 0] = steps[None, :, None]
    for s in range(n_sims):
        data[s, ..., 1] = s
    return data


def test_window_indices_cond0():
    cfg = NBodyDatasetConfig(n_bodies=2, input_steps=0, output_steps=24, time_interval=4)
    ds = NBodyDataset(cfg, data=_fake_data())
    # t_cushion_input = max(0*4, 1) = 1
    assert ds.t_cushion_input == 1
    assert ds.time_stamps_effective == (800 - 1 - 96) // 4
    x, y = ds.get_window(0)
    assert y.shape == (24, 2, 4)
    # y frames = [1, 5, 9, ...]
    np.testing.assert_allclose(y[:, 0, 0], 1 + 4 * np.arange(24))


def test_window_indices_cond4():
    cfg = NBodyDatasetConfig(n_bodies=2, input_steps=4, output_steps=20, time_interval=4)
    ds = NBodyDataset(cfg, data=_fake_data())
    x, y = ds.get_window(5)
    assert x.shape == (4, 2, 4) and y.shape == (20, 2, 4)
    # mid = 5*4 + 16 = 36; x = frames [20, 24, 28, 32], y = [36, 40, ...]
    np.testing.assert_allclose(x[:, 0, 0], [20, 24, 28, 32])
    np.testing.assert_allclose(y[0, 0, 0], 36)
    # x frames end exactly where y begins
    assert y[0, 0, 0] - x[-1, 0, 0] == 4


def test_batch_layout_and_normalization():
    cfg = NBodyDatasetConfig(n_bodies=2, input_steps=4, output_steps=20, time_interval=4)
    ds = NBodyDataset(cfg, data=_fake_data())
    batch = ds.get_batch(np.array([0, 1, 2]))
    assert batch["x"].shape == (3, 20, 8)
    assert batch["cond"].shape == (3, 4, 8)
    # /200 normalization (`utils.py:220`)
    raw_x, raw_y = ds.get_window(0)
    np.testing.assert_allclose(
        batch["x"][0], raw_y.transpose(0, 1, 2).reshape(20, 8) / 200.0, rtol=1e-6
    )


def test_sim_and_time_id_decomposition():
    cfg = NBodyDatasetConfig(n_bodies=2, input_steps=0, output_steps=24, time_interval=4)
    ds = NBodyDataset(cfg, data=_fake_data())
    eff = ds.time_stamps_effective
    _, y = ds.get_window(eff)  # first window of sim 1
    assert y[0, 0, 1] == 1.0  # sim id channel
    np.testing.assert_allclose(y[:, 0, 0], 1 + 4 * np.arange(24))


def test_iterate_batches_deterministic():
    cfg = NBodyDatasetConfig(n_bodies=2, input_steps=0, output_steps=24, time_interval=4)
    ds = NBodyDataset(cfg, data=_fake_data())
    b1 = next(ds.iterate_batches(4, seed=7))
    b2 = next(ds.iterate_batches(4, seed=7))
    np.testing.assert_array_equal(b1["x"], b2["x"])


def test_gns_batch_format():
    from cindm_tpu.data.nbody import NBodyDataset, NBodyDatasetConfig

    cfg = NBodyDatasetConfig(n_bodies=2, input_steps=0, output_steps=24, time_interval=4)
    ds = NBodyDataset(cfg, data=_fake_data())
    b = ds.get_gns_batch(np.array([0, 1]), n_his=4, noise_std=0.001)
    assert b["poss"].shape == (2, 2, 4, 2)
    assert b["tgt_poss"].shape == (2, 2, 20, 2)
    assert b["particle_type"].shape == (2, 2)
    # normalized positions
    assert np.abs(b["tgt_poss"]).max() <= 1.1
