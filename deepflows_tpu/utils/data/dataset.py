"""Dataset protocol (reference: `DeepFlows/utils/data/dataset.py:1-9`)."""


class Dataset:
    def __getitem__(self, index):
        raise NotImplementedError

    def __len__(self):
        raise NotImplementedError


class TensorDataset(Dataset):
    """Array-backed dataset supporting fancy-index batching (the reference's
    DataLoader indexes datasets with whole index lists,
    `utils/data/dataloader.py:73,91`)."""

    def __init__(self, *arrays):
        assert arrays and all(len(a) == len(arrays[0]) for a in arrays)
        self.arrays = arrays

    def __getitem__(self, index):
        out = tuple(a[index] for a in self.arrays)
        return out if len(out) > 1 else out[0]

    def __len__(self):
        return len(self.arrays[0])
