from .sharding import make_mesh, ShardedRenderer
