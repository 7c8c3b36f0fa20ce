from .mesh import default_mesh, grid_sharding, replicated_sharding
from .sweep import run_sweep_on_mesh

__all__ = [
    "default_mesh",
    "grid_sharding",
    "replicated_sharding",
    "run_sweep_on_mesh",
]
