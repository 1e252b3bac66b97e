from .mesh import data_sharding, initialize_multihost, make_mesh, replicate, replicated, shard_batch
from .sharded_sampling import make_sharded_sampler, shard_design_batch
