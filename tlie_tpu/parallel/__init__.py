from .mesh import default_mesh, grid_sharding, replicated_sharding
from .ring import ring_causal_attention
from .sp import seq_mesh, sp_diag_linear_scan, sp_linear_attention
from .sweep import run_sweep_on_mesh
from .tp import mesh_2d, shard_vocab_parallel, vocab_partition_specs

__all__ = [
    "default_mesh",
    "grid_sharding",
    "mesh_2d",
    "replicated_sharding",
    "ring_causal_attention",
    "run_sweep_on_mesh",
    "seq_mesh",
    "shard_vocab_parallel",
    "sp_diag_linear_scan",
    "sp_linear_attention",
    "vocab_partition_specs",
]
