from .schema import (
    ExperimentConfig,
    apply_sweep_point,
    expand_sweep,
    load_yaml,
    load_experiment,
    load_sweep,
)

__all__ = [
    "ExperimentConfig",
    "apply_sweep_point",
    "expand_sweep",
    "load_yaml",
    "load_experiment",
    "load_sweep",
]
