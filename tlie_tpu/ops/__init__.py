from .scan import diag_linear_scan
from .conv import depthwise_causal_conv1d
from .linear_attention import (
    chunked_linear_attention,
    recurrent_linear_attention,
)
from .ssd import ssd_chunked_scan, ssd_recurrent_scan
from .attention import causal_softmax_attention
from .eig import eigvals_pair
from .fused_xent import fused_softmax_xent
from . import fft

__all__ = [
    "diag_linear_scan",
    "depthwise_causal_conv1d",
    "chunked_linear_attention",
    "recurrent_linear_attention",
    "ssd_chunked_scan",
    "ssd_recurrent_scan",
    "causal_softmax_attention",
    "eigvals_pair",
    "fused_softmax_xent",
    "fft",
]
