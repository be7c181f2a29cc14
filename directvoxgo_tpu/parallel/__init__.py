from .mesh import make_mesh, shard_rays, replicate, shard_batch_tree
