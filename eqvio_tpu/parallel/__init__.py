from .mesh import init_distributed, make_mesh, shard_batch
from .batch import batch_sim_step, make_batched_states
from .landmark_shard import sharded_vision_update
