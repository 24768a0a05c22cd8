from .mesh import make_mesh, shard_step, shard_batch
from .distributed import (init_distributed, is_main_process,
                          host_local_batch, all_gather_metrics)
