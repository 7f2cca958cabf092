from .mesh import make_mesh, auto_data_mesh, shard_batch, replicate, data_sharding
