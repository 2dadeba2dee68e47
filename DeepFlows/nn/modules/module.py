from deepflows_tpu.nn.modules.module import Module  # noqa: F401
