from deepflows_tpu.utils.data.dataset import Dataset, TensorDataset  # noqa: F401
