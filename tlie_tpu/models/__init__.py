from .backbone import (
    BatchClassificationModel,
    ClassificationModel,
    SequenceLayer,
    StackedEncoderModel,
    masked_meanpool,
)
from .lru import LRU, init_LRU
from .s4 import S4, init_S4
from .s5 import S5SSM, init_S5

__all__ = [
    "BatchClassificationModel",
    "ClassificationModel",
    "SequenceLayer",
    "StackedEncoderModel",
    "masked_meanpool",
    "LRU",
    "init_LRU",
    "S4",
    "init_S4",
    "S5SSM",
    "init_S5",
]
