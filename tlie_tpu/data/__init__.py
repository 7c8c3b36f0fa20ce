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


from .cifar import CIFAR10, MNIST  # noqa: E402
from .listops import ListOps  # noqa: E402
from .wikitext import WikiText  # noqa: E402
from .imdb import IMDB  # noqa: E402
from .aan import AAN  # noqa: E402
from .pathfinder import PathFinder  # noqa: E402
from .speechcommands import SpeechCommands  # noqa: E402

__all__ += ["CIFAR10", "MNIST", "ListOps", "WikiText", "IMDB", "AAN",
            "PathFinder", "SpeechCommands"]
