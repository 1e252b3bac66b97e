"""CLI smoke tests: the default invocation is the smoke test (like the
reference, SURVEY.md §4: `train_1d.py` defaults to 6 steps)."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow


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


def test_train_1d_dp_mesh_and_eval(tmp_path):
    """--n_devices shards the train step over the virtual 8-CPU mesh and
    --eval_every runs the periodic EMA-sampling eval (VERDICT round-1 #8)."""
    from cindm_tpu.cli.train_1d import main

    state = main([
        "--dataset", "nbody-2", "--n_sims", "6", "--test_sims", "2",
        "--train_num_steps", "2", "--batch_size", "8", "--Unet_dim", "16",
        "--save_and_sample_every", "2", "--n_devices", "8",
        "--eval_every", "2", "--eval_batch", "4", "--eval_sample_steps", "5",
        "--log_every", "1",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    assert int(state["step"]) == 2
    assert (tmp_path / "r" / "eval_records.jsonl").exists()
    rec = json.loads((tmp_path / "r" / "eval_records.jsonl").read_text().splitlines()[-1])
    assert np.isfinite(rec["sample_mae"])


def test_train_1d_steps_per_launch(tmp_path):
    """--steps_per_launch fuses k micro-steps into one lax.scan launch;
    optimizer-step accounting (incl. grad accum) must be unchanged."""
    from cindm_tpu.cli.train_1d import main

    state = main([
        "--n_sims", "4", "--train_num_steps", "8", "--batch_size", "4",
        "--Unet_dim", "16", "--save_and_sample_every", "4", "--log_every", "2",
        "--steps_per_launch", "4",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "2",
    ])
    # 4 micro-steps/launch at accum 2 = 2 optimizer steps per launch
    assert int(state["step"]) == 8
    from cindm_tpu.train import CheckpointManager

    assert CheckpointManager(str(tmp_path / "r")).latest_milestone() == 8


def test_collision_enriched_sampler(tmp_path):
    """collision_frac draws part of every batch from close-encounter windows
    (the reference's more_collision training distribution)."""
    import numpy as np
    from cindm_tpu.data.nbody import NBodyDataset, NBodyDatasetConfig

    cfg = NBodyDatasetConfig(n_bodies=2, output_steps=8, time_stamps=200)
    ds = NBodyDataset(cfg, n_sims=4, seed=0,
                      cache_path=str(tmp_path / "traj.npy"))
    m = ds.collision_window_mask(threshold=60.0)
    assert m.shape == (len(ds),) and m.dtype == bool
    it = ds.iterate_batches(8, seed=0, collision_frac=0.5)
    b = next(it)
    assert b["x"].shape == (8, 8, 8)
    assert np.isfinite(b["x"]).all()
    # a permissive threshold marks every window, a strict one none
    assert ds.collision_window_mask(threshold=1e9).all()
    assert not ds.collision_window_mask(threshold=0.0).any()


def test_train_1d_grad_accum_counts_opt_steps(tmp_path):
    """train_num_steps counts optimizer steps, not micro-batches."""
    from cindm_tpu.cli.train_1d import main

    state = main([
        "--n_sims", "4", "--train_num_steps", "2", "--batch_size", "4",
        "--Unet_dim", "16", "--save_and_sample_every", "2", "--log_every", "1",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "2",
    ])
    assert int(state["step"]) == 2


@pytest.mark.parametrize("method", ["GNS_direct", "GNS_cond_one", "Unet_rollout_one"])
def test_train_1d_new_method_types(tmp_path, method):
    from cindm_tpu.cli.train_1d import main

    state = main([
        "--method_type", method, "--n_sims", "4", "--train_num_steps", "2",
        "--batch_size", "4", "--Unet_dim", "16", "--rollout_steps", "8",
        "--save_and_sample_every", "2", "--log_every", "1",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    assert int(state["step"]) == 2


def test_design_1d_baseline_gns_loads_trained_ckpt(tmp_path):
    """The GNS design baseline must run on TRAINED weights (VERDICT #5):
    train GNS_direct briefly, then design with --model_path pointing at it."""
    from cindm_tpu.cli.design_1d_baseline import main as design_main
    from cindm_tpu.cli.train_1d import main as train_main

    train_main([
        "--method_type", "GNS_direct", "--n_sims", "4", "--train_num_steps", "2",
        "--batch_size", "4", "--rollout_steps", "8",
        "--save_and_sample_every", "2", "--log_every", "1",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    record = design_main([
        "--design_method", "backprop", "--method_type", "GNS_direct",
        "--model_path", str(tmp_path / "r"),
        "--max_design_steps", "2", "--batch_size", "2", "--rollout_steps", "7",
    ])
    assert np.isfinite(record["design_obj_simu"])


def test_design_1d_baseline_backprop_smoke(tmp_path):
    from cindm_tpu.cli.design_1d_baseline import main

    record = main([
        "--design_method", "backprop", "--method_type", "Unet",
        "--model_path", str(tmp_path / "nonexistent"),
        "--max_design_steps", "3", "--batch_size", "2", "--Unet_dim", "16",
        "--rollout_steps", "23", "--allow_random_init", "True",
    ])
    assert np.isfinite(record["design_obj_simu"])
    assert record["loaded_milestone"] is None


def test_design_1d_baseline_missing_ckpt_fails_loudly(tmp_path):
    """A typo'd --model_path must raise, not silently use random weights
    (VERDICT round-2 weak #1)."""
    from cindm_tpu.cli.design_1d_baseline import main

    with pytest.raises(FileNotFoundError, match="allow_random_init"):
        main([
            "--design_method", "backprop", "--method_type", "Unet",
            "--model_path", str(tmp_path / "typo"),
            "--max_design_steps", "1", "--batch_size", "1", "--Unet_dim", "16",
        ])


def test_design_2d_baseline_gd_smoke():
    from cindm_tpu.cli.design_2d_baseline import main

    record = main([
        "--design_method", "GD", "--surrogate", "fno",
        "--optim_iter", "5", "--rollout", "2", "--batch_size", "1",
        "--is_testdata", "True", "--n_sims", "2", "--evaluate", "False",
    ])
    assert np.isfinite(record["obj_last"])
    # gradient descent should not increase the objective
    assert record["obj_last"] <= record["obj_first"] + 1e-3


def test_train_2d_remat_smoke(tmp_path):
    """--remat (jax.checkpoint on the denoiser) must train identically in
    expectation — smoke: loss finite, checkpoint written."""
    from cindm_tpu.cli.train_2d import main

    state = main([
        "--train_num_steps", "2", "--batch_size", "2", "--n_sims", "2",
        "--save_and_sample_every", "2", "--remat", "True",
        "--steps_per_launch", "1", "--is_testdata", "True",
        "--results_folder", str(tmp_path / "r"),
        "--data_cache", str(tmp_path / "d"),
    ])
    assert int(state["step"]) == 2


def test_design_2d_baseline_two_boundaries():
    """--num_boundaries 2 must be real (VERDICT round-2 missing #4): K
    boundaries in the init grid, K-cluster validity, K-polygon scoring."""
    from cindm_tpu.cli.design_2d_baseline import main

    record = main([
        "--design_method", "GD", "--surrogate", "fno",
        "--num_boundaries", "2",
        "--optim_iter", "3", "--rollout", "1", "--batch_size", "2",
        "--is_testdata", "True", "--n_sims", "2", "--evaluate", "False",
    ])
    assert record["num_boundaries"] == 2
    assert np.isfinite(record["obj_last"])
    # the K-station init keeps the boundaries separated, so a 3-iter GD run
    # should still reconstruct 2 clusters for at least one sample
    assert record["valid_designs"] >= 1


def test_design_2d_baseline_cem_smoke():
    from cindm_tpu.cli.design_2d_baseline import main

    record = main([
        "--design_method", "CEM", "--surrogate", "fno",
        "--optim_iter", "2", "--rollout", "1", "--batch_size", "1",
        "--N", "8", "--Ne", "2",
        "--is_testdata", "True", "--n_sims", "2", "--evaluate", "False",
    ])
    assert np.isfinite(record["obj_last"])


def test_design_1d_sharded_8dev(tmp_path):
    """design_1d --n_devices shards the guided sampling batch over the
    virtual 8-CPU mesh (VERDICT round-2 #6: the sampling path must be
    user-reachable on a mesh, not just unit-tested)."""
    import jax

    from cindm_tpu.cli.design_1d import main as design_main
    from cindm_tpu.cli.train_1d import main as train_main

    assert jax.device_count() >= 8
    train_main([
        "--n_sims", "4", "--train_num_steps", "2", "--batch_size", "4",
        "--Unet_dim", "16", "--save_and_sample_every", "2",
        "--results_folder", str(tmp_path / "r"),
        "--dataset_path", str(tmp_path / "d"),
        "--gradient_accumulate_every", "1",
    ])
    record = design_main([
        "--model_path", str(tmp_path / "r"), "--Unet_dim", "16",
        "--batch_size", "8", "--timesteps", "20", "--sample_steps", "20",
        "--design_guidance", "standard", "--n_devices", "8",
        "--compose_n_bodies", "4", "--host_chunks", "2",
    ])
    assert np.isfinite(record["design_obj"])


def test_analysis_1d_multibody_strategies(tmp_path):
    """--compose_multibodies compares pairwise vs classifier-free EBM
    composition (ULA/UHMC) at N bodies (VERDICT round-2 missing #7)."""
    from cindm_tpu.cli.analysis_1d import main as analysis_main
    from cindm_tpu.cli.train_1d import main as train_main

    common = [
        "--n_sims", "4", "--train_num_steps", "2", "--batch_size", "4",
        "--Unet_dim", "16", "--save_and_sample_every", "2", "--log_every", "1",
        "--conditioned_steps", "1", "--rollout_steps", "7",
        "--gradient_accumulate_every", "1",
        "--dataset_path", str(tmp_path / "d"),
    ]
    train_main(["--dataset", "nbody-2", "--n_bodies", "2",
                "--results_folder", str(tmp_path / "pair")] + common)
    train_main(["--dataset", "nbody-1", "--n_bodies", "1",
                "--results_folder", str(tmp_path / "uncond")] + common)
    record = analysis_main([
        "--model_path", str(tmp_path / "pair"),
        "--uncond_model_path", str(tmp_path / "uncond"),
        "--compose_multibodies", "4", "--Unet_dim", "16",
        "--conditioned_steps", "1", "--rollout_steps", "7",
        "--timesteps", "20", "--sample_steps", "10", "--t_switch", "10",
        "--langevin_steps", "2", "--batch_size", "2", "--n_sims", "2",
    ])
    multi = record["multibody_strategies"]
    for k in ("pairwise_compose", "cf_compose_ULA", "cf_compose_UHMC", "SimuSolver"):
        assert np.isfinite(multi[k]["mae"]), k
    # the simulator floor must beat the 2-step-trained models
    assert multi["SimuSolver"]["mae"] <= multi["pairwise_compose"]["mae"]

    # conditioned_steps==0 protocol (the real nbody2_coll prior): the first
    # ground-truth frame is q-sample-inpainted and scoring starts at frame 1
    record0 = analysis_main([
        "--model_path", str(tmp_path / "pair"),
        "--uncond_model_path", str(tmp_path / "uncond"),
        "--compose_multibodies", "4", "--Unet_dim", "16",
        "--conditioned_steps", "0", "--rollout_steps", "8",
        "--timesteps", "20", "--sample_steps", "10", "--t_switch", "10",
        "--langevin_steps", "2", "--batch_size", "2", "--n_sims", "2",
    ])
    multi0 = record0["multibody_strategies"]
    for k in ("pairwise_compose", "cf_compose_ULA", "cf_compose_UHMC", "SimuSolver"):
        assert np.isfinite(multi0[k]["mae"]), k
    assert multi0["SimuSolver"]["mae"] <= multi0["pairwise_compose"]["mae"]


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


def test_train_baseline_widened_flags(tmp_path):
    """B4 flag surface (le_pde argparser semantics): weighted multi_step
    spec, multi_step_start_epoch gating, cosine lr + weight decay (adamw),
    data noise, loss_type, val split + hash-named experiment record."""
    import glob
    import json as _json

    from cindm_tpu.cli.train_baseline import main as tb_main

    state = tb_main([
        "--algo", "fno", "--n_sims", "2", "--epochs", "2",
        "--steps_per_epoch", "2", "--batch_size", "2",
        "--multi_step", "1^2:1e-1", "--multi_step_start_epoch", "1",
        "--loss_type", "l1", "--data_noise_amp", "1e-3",
        "--lr_scheduler_type", "cos", "--weight_decay", "1e-4",
        "--fno_modes", "4", "--fno_width", "8",
        "--is_unittest", "False", "--is_testdata", "True",
        "--results_folder", str(tmp_path / "fno"),
    ])
    assert int(state["step"]) == 4
    recs = glob.glob(str(tmp_path / "fno" / "record_*.json"))
    assert len(recs) == 1
    rec = _json.load(open(recs[0]))
    assert len(rec["history"]) == 2
    assert rec["history"][0]["val_loss"] is not None
    assert rec["args"]["multi_step"] == "1^2:1e-1"


def test_design2d_region_bands_respect_support_band():
    """--region_band splits the prior's placement band, not full H: every
    band must lie inside [lo, hi)·H and bands must be disjoint with 2-cell
    gaps (the round-4 nb=3 fragmentation fix)."""
    import numpy as np
    from cindm_tpu.cli.design_2d import make_region_bands

    H = W = 64
    bands = np.asarray(make_region_bands(H, W, 3, 0.2, 0.8))
    assert bands.shape == (3, H, W)
    rows_any = bands.max(axis=2)  # [3, H]
    # inside the support band only
    occupied = np.where(rows_any.max(axis=0) > 0)[0]
    assert occupied.min() >= 0.2 * H + 2 - 1e-6
    assert occupied.max() < 0.8 * H - 2
    # disjoint and ordered, each band non-empty and ≥8 rows tall
    for k in range(3):
        rk = np.where(rows_any[k] > 0)[0]
        assert len(rk) >= 8
        if k:
            prev = np.where(rows_any[k - 1] > 0)[0]
            assert rk.min() > prev.max() + 1  # ≥2-cell gap (rounding slack)
    # default args reproduce the round-4 full-height behaviour
    full = np.asarray(make_region_bands(H, W, 2))
    occ = np.where(full.max(axis=(0, 2)) > 0)[0]
    assert occ.min() == 2 and occ.max() == H - 1 - 2
