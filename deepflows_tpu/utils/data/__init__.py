from .dataloader import (
    BatchSampler,
    DataLoader,
    DistributedSampler,
    RandomSampler,
    Sampler,
    SequentialSampler,
    data_loader,
)
from .dataset import Dataset, TensorDataset
from .pre import load_image_folder, read_png_images_from_folder

__all__ = [
    "Dataset",
    "TensorDataset",
    "DataLoader",
    "data_loader",
    "Sampler",
    "SequentialSampler",
    "RandomSampler",
    "BatchSampler",
    "DistributedSampler",
    "read_png_images_from_folder",
    "load_image_folder",
]

from .transforms import (  # noqa: E402
    Compose,
    Normalize,
    RandomCrop,
    RandomErasing,
    RandomHorizontalFlip,
)

__all__ += [
    "Compose",
    "Normalize",
    "RandomCrop",
    "RandomErasing",
    "RandomHorizontalFlip",
]

from .device_loader import DeviceDataLoader  # noqa: E402

__all__ += ["DeviceDataLoader"]
