from deepflows_tpu.nn.parameter import Parameter  # noqa: F401
