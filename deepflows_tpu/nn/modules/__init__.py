"""nn.modules exports (reference: `DeepFlows/nn/modules/__init__.py:1-8`)."""

from .activation import (
    GELU,
    ReLU6,
    LeakyReLU,
    LogSoftmax,
    ReLU,
    Sigmoid,
    SiLU,
    Softmax,
    Tanh,
)
from .batchnorm import BatchNorm1d, BatchNorm2d
from .container import ModuleDict, ModuleList, Sequential
from .conv import Conv1d, Conv2d, WSConv2d
from .dropout import Dropout
from .flatten import Flatten
from .linear import Identity, Linear
from .loss import (BCELoss, CrossEntropyLoss, L1Loss, LMHeadCrossEntropy,
                   MSELoss, NLLLoss)
from .module import Module
from .attention import MultiheadAttention
from .embedding import Embedding
from .moe import MoE, MoECriterion
from .normalization import GroupNorm, LayerNorm, RMSNorm
from .remat import Remat, remat_call
from .pool import (
    AdaptiveAvgPool2d,
    AvgPool1d,
    AvgPool2d,
    MaxPool1d,
    MaxPool2d,
)

__all__ = [
    "Module",
    "Identity",
    "Linear",
    "Conv1d",
    "Conv2d",
    "WSConv2d",
    "MaxPool1d",
    "MaxPool2d",
    "AvgPool1d",
    "AvgPool2d",
    "AdaptiveAvgPool2d",
    "BatchNorm1d",
    "BatchNorm2d",
    "Dropout",
    "Flatten",
    "Sequential",
    "ModuleList",
    "ModuleDict",
    "ReLU",
    "ReLU6",
    "Sigmoid",
    "SiLU",
    "Tanh",
    "GELU",
    "LeakyReLU",
    "Softmax",
    "LogSoftmax",
    "L1Loss",
    "NLLLoss",
    "MSELoss",
    "BCELoss",
    "CrossEntropyLoss",
    "LMHeadCrossEntropy",
    "Remat",
    "remat_call",
    "LayerNorm",
    "GroupNorm",
    "RMSNorm",
    "Embedding",
    "MultiheadAttention",
    "MoE",
    "MoECriterion",
]
