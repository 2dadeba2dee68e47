from deepflows_tpu.optim.adadelta import *  # noqa: F401,F403
from deepflows_tpu.optim.adadelta import Adadelta  # noqa: F401
