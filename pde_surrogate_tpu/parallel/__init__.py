"""Device meshes and sharding policies (data parallelism over ICI)."""

from .mesh import (data_mesh, batch_sharding, replicated, shard_batch,
                   replicate)
