from deepflows_tpu.optim import *  # noqa: F401,F403
from deepflows_tpu.optim import Adam, SGD, Adagrad, Adadelta  # noqa: F401
