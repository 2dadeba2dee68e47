from deepflows_tpu.backend import *  # noqa: F401,F403
