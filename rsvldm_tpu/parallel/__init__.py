from .mesh import make_mesh, batch_sharding, replicate, shard_tiled_gn_apply
