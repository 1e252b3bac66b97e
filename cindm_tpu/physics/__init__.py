from .nbody import eval_simu, generate_initial_states, simulate
from . import bdim
from .bdim import BDIMConfig, simulate_flow, simulate_flow_batch
