from .airfoil import AirfoilDataset, AirfoilDatasetConfig, generate_airfoil_sims
from .nbody import NBodyDataset, NBodyDatasetConfig, generate_trajectories
