from deepflows_tpu.backend_selection import *  # noqa: F401,F403
