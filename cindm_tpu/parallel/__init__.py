from .mesh import data_sharding, make_mesh, replicate, replicated, shard_batch
from .sharded_sampling import make_sharded_sampler, shard_design_batch
