from deepflows_tpu.optim.adam import *  # noqa: F401,F403
from deepflows_tpu.optim.adam import Adam  # noqa: F401
