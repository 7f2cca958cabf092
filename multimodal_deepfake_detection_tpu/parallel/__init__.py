from .mesh import make_mesh, auto_data_mesh, shard_batch, replicate, data_sharding
from .distributed import initialize as distributed_initialize, hybrid_mesh
