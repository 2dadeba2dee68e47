"""optim package (reference: `DeepFlows/optim/`)."""

from .adadelta import Adadelta
from .adagrad import Adagrad
from .adam import Adam
from .optimizer import Optimizer
from .scheduler import CosineAnnealingLR, LRScheduler, StepLR, WarmupCosineLR
from .sgd import SGD

__all__ = [
    "Optimizer",
    "SGD",
    "Adam",
    "Adagrad",
    "Adadelta",
    "LRScheduler",
    "StepLR",
    "CosineAnnealingLR",
    "WarmupCosineLR",
]
