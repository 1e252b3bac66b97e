"""CLI entry points mirroring the reference scripts (SURVEY.md §2.7):

  python -m cindm_tpu.cli.train_1d            (train/train_1d.py)
  python -m cindm_tpu.cli.train_2d            (train/train_2d.py)
  python -m cindm_tpu.cli.design_1d           (inference/inverse_design_diffusion_1d.py)
  python -m cindm_tpu.cli.design_2d           (inference/inverse_design_2d.py + evaluation_2d)
  python -m cindm_tpu.cli.design_1d_baseline  (inference/inverse_design_1d_baseline.py)
"""
