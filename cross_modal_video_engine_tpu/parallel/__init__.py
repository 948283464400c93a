from .mesh import (
    make_mesh, data_sharding, replicated, shard_rows, host_gather,
)
