from .extractors import (
    eig_att_softmax,
    eig_att_linear,
    eig_att_norm,
    eig_mamba2,
    eig_mamba2_lti,
    eig_lru,
    eig_s5,
    eig_s4,
)
from .binning import threshold_analysis, threshold_analysis_ssm
from .eval_eig import eval_eig

__all__ = [
    "eig_att_softmax",
    "eig_att_linear",
    "eig_att_norm",
    "eig_mamba2",
    "eig_mamba2_lti",
    "eig_lru",
    "eig_s5",
    "eig_s4",
    "threshold_analysis",
    "threshold_analysis_ssm",
    "eval_eig",
]
