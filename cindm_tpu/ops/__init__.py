from .precision import bf16_eps_model, cast_floating
from .fused_conv_gn import fused_conv1d_gn_mish, fused_conv1d_gn_mish_reference
