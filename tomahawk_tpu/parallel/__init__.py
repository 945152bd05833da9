from .mesh import make_mesh, shard_count_sweep, shard_extract_sweep
from .distributed import (init_distributed, resolve_mesh, partition_tiles,
                          shard_output_path, shard_paths, sync_shards,
                          merge_shards)
