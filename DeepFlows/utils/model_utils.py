from deepflows_tpu.utils.model_utils import load_checkpoint, save_checkpoint  # noqa: F401
