from .compose import EpsModel, make_composed_eps_model, pair_indices, window_coverage
from .diffusion1d import Diffusion1DConfig, p_losses, sample, sample_total_steps
from .guidance import confidence_interval_95, get_design_fn, get_eval_fn, get_eval_fn_per_sample
from .sampler import GuidanceSpec, ddim_sample_loop, p_sample_loop, p_sample_step
from .compose_time import (
    autoregress_time_compose_sample,
    composing_time_sample,
    make_classifier_free_compose_eps,
    sample_compose_multibodies,
    sample_compose_multibodies_uhmc,
)
from .diffusion2d import (
    Diffusion2DConfig,
    asynchronous_clamp,
    ddim_sample_loop_2d,
    p_losses_2d,
    p_sample_loop_2d,
    sample_noise,
    share_states_over_boundaries,
)
from .guidance2d import make_design_grad_fn, mask_denoise
