from deepflows_tpu.nn.modules import *  # noqa: F401,F403
