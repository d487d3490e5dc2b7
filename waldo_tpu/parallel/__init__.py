from .mesh import make_mesh, shard_batch, replicate, init_distributed, MeshContext
from .sharding import set_active_mesh, get_active_mesh, shard_tokens, shard_batch_only
