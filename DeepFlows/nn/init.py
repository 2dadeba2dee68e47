from deepflows_tpu.nn.init import *  # noqa: F401,F403
