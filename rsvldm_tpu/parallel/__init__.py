from .mesh import make_mesh, batch_sharding, replicate, shard_tiled_gn_apply
from .sequence import (gpipe_apply, sequence_parallel_attention,
                       stack_stage_params)
