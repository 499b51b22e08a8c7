from .mesh import (make_mesh, batch_sharding, put_batch, replicate,
                   replicate_state, shard_tiled_gn_apply)
from .sequence import (gpipe_apply, sequence_parallel_attention,
                       stack_stage_params)
