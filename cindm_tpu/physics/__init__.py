from .nbody import eval_simu, generate_initial_states, simulate
