from deepflows_tpu.optim.optimizer import *  # noqa: F401,F403
from deepflows_tpu.optim.optimizer import Optimizer  # noqa: F401
