from .mesh import make_mesh, shard_count_sweep, shard_extract_sweep
