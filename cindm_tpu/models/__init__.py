from .unet1d import TemporalUnet1D
from .unet1d_generic import Unet1D
from .unet2d import ForceUnet, Unet2D
