from .precision import bf16_eps_model, cast_floating
