from .design_opt import BackpropConfig, CEMConfig, backprop_design, cem_design, clamp_nbody_cond
from .fno import FNO1d, FNO2d, SpectralConv1d, SpectralConv2d
from .gns import GNSConfig, GNSNet, gns_direct_rollout, gns_rollout, make_gns_loss
from .lepde import LEPDE, LEPDEConfig, lepde_loss
from .unet_forward import Unet1DForwardModel
