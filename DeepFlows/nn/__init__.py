from deepflows_tpu.nn import *  # noqa: F401,F403
from deepflows_tpu.nn import functional, init, Parameter  # noqa: F401
