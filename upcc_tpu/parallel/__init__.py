from .data_parallel import make_mesh, make_dp_train_step, shard_batch
from .block_parallel import parallel_map_blocks, shard_points_by_block
from .model_parallel import (make_mesh_2d, make_sharded_train_step,
                             shard_inputs, shard_state)
