from .mesh import (
    make_mesh, data_sharding, replicated, shard_rows, host_gather,
)
from .pipeline import spmd_pipeline, stack_stage_params
from .moe import expert_parallel_mlp
