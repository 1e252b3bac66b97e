from .unet1d import TemporalUnet1D
