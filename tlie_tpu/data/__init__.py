from .base import (
    HostArrayLoader,
    SequenceDataset,
    argmax_accuracy,
    masked_accuracy,
    perplexity,
)
from .mqar import MQAR, multiquery_ar

__all__ = [
    "HostArrayLoader",
    "SequenceDataset",
    "argmax_accuracy",
    "masked_accuracy",
    "perplexity",
    "MQAR",
    "multiquery_ar",
]


def _register_optional():
    """Import optional dataset modules; each registers itself."""
    from . import cifar  # noqa: F401
    from . import listops  # noqa: F401
    from . import wikitext  # noqa: F401
    from . import imdb  # noqa: F401


try:
    _register_optional()
except ImportError:
    pass
