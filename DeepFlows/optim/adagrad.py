from deepflows_tpu.optim.adagrad import *  # noqa: F401,F403
from deepflows_tpu.optim.adagrad import Adagrad  # noqa: F401
