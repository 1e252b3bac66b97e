"""CLI smoke tests: the default invocation is the smoke test (like the
reference, SURVEY.md §4: `train_1d.py` defaults to 6 steps)."""

import json

import numpy as np
import pytest


def test_train_1d_diffusion_smoke(tmp_path):
    from cindm_tpu.cli.train_1d import main

    state = main([
        "--dataset", "nbody-2", "--n_sims", "4", "--train_num_steps", "3",
        "--batch_size", "4", "--Unet_dim", "16", "--save_and_sample_every", "2",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    assert int(state["step"]) == 3


def test_train_1d_forward_model_smoke(tmp_path):
    from cindm_tpu.cli.train_1d import main

    state = main([
        "--method_type", "forward_model", "--n_sims", "4", "--train_num_steps", "2",
        "--batch_size", "4", "--Unet_dim", "16", "--save_and_sample_every", "2",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    assert int(state["step"]) == 2


def test_design_1d_after_training(tmp_path):
    from cindm_tpu.cli.design_1d import main as design_main
    from cindm_tpu.cli.train_1d import main as train_main

    train_main([
        "--n_sims", "4", "--train_num_steps", "2", "--batch_size", "4",
        "--Unet_dim", "16", "--save_and_sample_every", "2",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    record = design_main([
        "--model_path", str(tmp_path / "r"), "--Unet_dim", "16",
        "--batch_size", "2", "--timesteps", "1000", "--sample_steps", "20",
        "--design_guidance", "standard",
    ])
    assert np.isfinite(record["design_obj"])
    assert np.isfinite(record["MAE"])


def test_design_1d_baseline_backprop_smoke():
    from cindm_tpu.cli.design_1d_baseline import main

    record = main([
        "--design_method", "backprop", "--method_type", "Unet",
        "--max_design_steps", "3", "--batch_size", "2", "--Unet_dim", "16",
        "--rollout_steps", "23",
    ])
    assert np.isfinite(record["design_obj_simu"])


def test_design_2d_baseline_gd_smoke():
    from cindm_tpu.cli.design_2d_baseline import main

    record = main([
        "--design_method", "GD", "--surrogate", "fno",
        "--optim_iter", "5", "--rollout", "2", "--batch_size", "1",
    ])
    assert np.isfinite(record["obj_last"])
    # gradient descent should not increase the objective
    assert record["obj_last"] <= record["obj_first"] + 1e-3


def test_design_2d_baseline_cem_smoke():
    from cindm_tpu.cli.design_2d_baseline import main

    record = main([
        "--design_method", "CEM", "--surrogate", "fno",
        "--optim_iter", "2", "--rollout", "1", "--batch_size", "1",
        "--N", "8", "--Ne", "2",
    ])
    assert np.isfinite(record["obj_last"])


def test_train_1d_resume(tmp_path):
    from cindm_tpu.cli.train_1d import main

    common = [
        "--n_sims", "4", "--batch_size", "4", "--Unet_dim", "16",
        "--save_and_sample_every", "2",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ]
    s1 = main(["--train_num_steps", "2"] + common)
    assert int(s1["step"]) == 2
    s2 = main(["--train_num_steps", "4", "--resume", "True"] + common)
    assert int(s2["step"]) == 4
