from .boundary import (
    filter_isolated_points,
    find_cluster_boundary,
    find_clusters,
    order_boundary_points,
    polygons_overlap,
    reconstruct_boundary,
)
from .eval2d import evaluate_designs, metric, metric_batch
from .observability import MetricTracker, Printer, confidence_interval_95, profile_trace
from .cache import enable_compile_cache
from .torch_convert import convert_temporal_unet1d, load_reference_checkpoint
from .extras import custom_l1_speed_loss, plot_field, plot_trajectories, random_walk_noise
