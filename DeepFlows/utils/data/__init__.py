from deepflows_tpu.utils.data import *  # noqa: F401,F403
