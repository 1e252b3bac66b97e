from .compose import EpsModel, make_composed_eps_model, pair_indices, window_coverage
from .diffusion1d import Diffusion1DConfig, p_losses, sample
from .guidance import confidence_interval_95, get_design_fn, get_eval_fn, get_eval_fn_per_sample
from .sampler import GuidanceSpec, ddim_sample_loop, p_sample_loop, p_sample_step
