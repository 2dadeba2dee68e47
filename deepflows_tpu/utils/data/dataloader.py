"""DataLoader + samplers (reference: `DeepFlows/utils/data/dataloader.py`).

Same surface: Sequential/Random/Batch samplers, fancy-index batching (a batch
is fetched as ``dataset[index_list]``), an optional prefetch buffer, the
``data_loader(X, y, ...)`` convenience, and ``as_contiguous``.  TPU note: the
prefetch buffer overlaps host batch assembly with device compute — with a
CompiledTrainStep the transfer itself is async under JAX, so prefetch mainly
hides numpy indexing/augmentation cost.
"""

from __future__ import annotations

import numpy as np

from .dataset import Dataset, TensorDataset


class Sampler:
    def __init__(self, dataset):
        pass

    def __iter__(self):
        raise NotImplementedError


class SequentialSampler(Sampler):
    def __init__(self, dataset):
        super().__init__(dataset)
        self.dataset = dataset

    def __iter__(self):
        return iter(range(len(self.dataset)))

    def __len__(self) -> int:
        return len(self.dataset)


class RandomSampler(Sampler):
    def __init__(self, dataset, seed=None):
        super().__init__(dataset)
        self.dataset = dataset
        self._rng = np.random.default_rng(seed)

    def __iter__(self):
        yield from self._rng.permutation(len(self.dataset)).tolist()

    def __len__(self):
        return len(self.dataset)


class BatchSampler(Sampler):
    def __init__(self, sampler, batch_size, drop_last):
        super().__init__(sampler)
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __iter__(self):
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        if self.drop_last:
            return len(self.sampler) // self.batch_size
        return (len(self.sampler) + self.batch_size - 1) // self.batch_size


class _DataLoaderIter:
    def __init__(self, loader):
        self.loader = loader
        self.sample_iter = iter(loader.batch_sampler)
        self.buffer = []
        self._fill_buffer()

    def _fetch(self, index):
        batch = self.loader.dataset[index]
        if self.loader.collate_fn is not None:
            batch = self.loader.collate_fn(batch)
        if self.loader.as_contiguous and isinstance(batch, tuple):
            batch = tuple(
                np.ascontiguousarray(b) if isinstance(b, np.ndarray) else b
                for b in batch
            )
        return batch

    def _fill_buffer(self):
        while len(self.buffer) < self.loader.prefetch_size:
            try:
                index = next(self.sample_iter)
            except StopIteration:
                break
            self.buffer.append(self._fetch(index))

    def __next__(self):
        if self.buffer:
            batch = self.buffer.pop(0)
            self._fill_buffer()
            return batch
        return self._fetch(next(self.sample_iter))

    def __iter__(self):
        return self


class DataLoader:
    def __init__(
        self,
        dataset: Dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: bool = False,
        prefetch_size: int = 0,
        as_contiguous: bool = True,
        collate_fn=None,
        seed=None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch_size = max(0, int(prefetch_size))
        self.as_contiguous = as_contiguous
        self.collate_fn = collate_fn
        self.sampler = (
            RandomSampler(dataset, seed=seed) if shuffle else SequentialSampler(dataset)
        )
        self.batch_sampler = BatchSampler(self.sampler, batch_size, drop_last)

    def __iter__(self):
        return _DataLoaderIter(self)

    def __len__(self):
        return len(self.batch_sampler)


def data_loader(
    X,
    y,
    batch_size,
    shuffle=False,
    prefetch_size: int = 0,
    as_contiguous: bool = True,
    drop_last: bool = False,
):
    """Convenience wrapper over in-memory arrays (reference
    `dataloader.py:126-139`).  ``drop_last`` added: fixed batch shapes avoid
    XLA retraces on the ragged final batch."""
    return DataLoader(
        TensorDataset(X, y),
        batch_size,
        shuffle,
        drop_last=drop_last,
        prefetch_size=prefetch_size,
        as_contiguous=as_contiguous,
    )
