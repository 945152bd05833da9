from .mesh import make_mesh, sharded_phased_ld
