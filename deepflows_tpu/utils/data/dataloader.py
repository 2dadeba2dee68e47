"""TPU-first data pipeline (role parity: `DeepFlows/utils/data/dataloader.py`).

Same *surface* as the reference loader (samplers, fancy-index batching via
``dataset[index_list]``, ``data_loader(X, y, ...)``) but a different engine,
built for feeding an accelerator:

- the per-epoch index plan is one vectorized numpy permutation sliced into
  batches, not an iterator chain;
- ``prefetch_size > 0`` runs batch assembly (indexing, collate, augmentation)
  on a background daemon thread that feeds a bounded queue, so host-side work
  genuinely overlaps device compute (the reference refilled its buffer
  synchronously on the consumer thread — zero overlap);
- ``device=`` stages each assembled batch with ``jax.device_put`` *inside the
  producer thread*; the dispatch is asynchronous, so batch N+1's host→device
  transfer rides under batch N's compute.
"""

from __future__ import annotations

import itertools
import queue
import threading

import numpy as np

from .dataset import Dataset, TensorDataset


class Sampler:
    """Index-stream protocol (reference surface: `utils/data/dataloader.py:5-18`)."""

    def __init__(self, source=None):
        self.source = source

    def __iter__(self):
        raise NotImplementedError

    def __len__(self):
        return len(self.source)


class SequentialSampler(Sampler):
    @property
    def dataset(self):  # reference attribute name
        return self.source

    def __iter__(self):
        return iter(range(len(self.source)))


class RandomSampler(Sampler):
    def __init__(self, source, seed=None):
        super().__init__(source)
        self._rng = np.random.default_rng(seed)

    @property
    def dataset(self):
        return self.source

    def __iter__(self):
        return iter(self._rng.permutation(len(self.source)).tolist())


class DistributedSampler(Sampler):
    """Per-process shard of the index stream for multi-host training
    (extension; the reference is single-process).  torch-compatible
    surface: ``num_replicas``/``rank`` default to the jax process grid
    (``jax.process_count()`` / ``jax.process_index()``), every replica sees
    the SAME seeded permutation of one epoch and takes a disjoint
    rank-strided slice, and ``set_epoch(e)`` reseeds so shuffles differ
    across epochs while staying identical across ranks.

    ``drop_last=False`` pads the stream to a multiple of ``num_replicas``
    by wrapping around (every rank yields the same count — collective
    steps stay shape-aligned); ``drop_last=True`` truncates instead."""

    def __init__(
        self,
        source,
        num_replicas=None,
        rank=None,
        shuffle=True,
        seed=0,
        drop_last=False,
    ):
        super().__init__(source)
        if num_replicas is None or rank is None:
            import jax

            num_replicas = jax.process_count() if num_replicas is None else num_replicas
            rank = jax.process_index() if rank is None else rank
        if not (0 <= rank < num_replicas):
            raise ValueError(f"rank {rank} out of range for {num_replicas} replicas")
        self.num_replicas = int(num_replicas)
        self.rank = int(rank)
        self.shuffle = bool(shuffle)
        self.seed = int(seed)
        self.drop_last = bool(drop_last)
        self.epoch = 0
        n = len(source)
        if self.drop_last:
            self.num_samples = n // self.num_replicas
        else:
            self.num_samples = -(-n // self.num_replicas)  # ceil

    @property
    def dataset(self):
        return self.source

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __iter__(self):
        n = len(self.source)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        else:
            order = np.arange(n)
        total = self.num_samples * self.num_replicas
        if total > n:  # wrap-around pad so all ranks yield num_samples
            order = np.concatenate([order, order[: total - n]])
        else:
            order = order[:total]
        return iter(order[self.rank :: self.num_replicas].tolist())

    def __len__(self):
        return self.num_samples


class BatchSampler(Sampler):
    """Chunk an index stream into lists of ``batch_size``."""

    def __init__(self, sampler, batch_size, drop_last=False):
        super().__init__(sampler)
        self.sampler = sampler
        self.batch_size = int(batch_size)
        self.drop_last = bool(drop_last)

    def __iter__(self):
        stream = iter(self.sampler)
        while True:
            chunk = list(itertools.islice(stream, self.batch_size))
            if not chunk or (self.drop_last and len(chunk) < self.batch_size):
                return
            yield chunk

    def __len__(self):
        full, rem = divmod(len(self.sampler), self.batch_size)
        return full + (1 if rem and not self.drop_last else 0)


_DONE = object()


def _produce(batch_indices, assemble, q, stop, errbox):
    """Producer body — a FREE function so the worker thread holds no
    reference to the _Prefetcher (otherwise an abandoned, never-started
    iterator could never be garbage-collected and its thread would spin
    forever)."""
    try:
        for idx in batch_indices:
            if stop.is_set():
                return
            item = assemble(idx)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue
    except BaseException as exc:  # surfaced on the consumer thread
        errbox.append(exc)
    finally:
        while not stop.is_set():
            try:
                q.put(_DONE, timeout=0.1)
                break
            except queue.Full:
                continue


class _Prefetcher:
    """Daemon producer thread pushing assembled batches into a bounded queue.

    The queue depth bounds host memory; ``close()`` stops the producer
    promptly — it runs from generator teardown when a consumer exits
    mid-epoch, and from ``__del__`` when an iterator is dropped without ever
    being started."""

    def __init__(self, batch_indices, assemble, depth):
        self._queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._errbox = []
        self._worker = threading.Thread(
            target=_produce,
            args=(batch_indices, assemble, self._queue, self._stop, self._errbox),
            daemon=True,
            name="deepflows-prefetch",
        )
        self._worker.start()

    def close(self):
        self._stop.set()

    __del__ = close

    def __iter__(self):
        try:
            while True:
                item = self._queue.get()
                if item is _DONE:
                    if self._errbox:
                        raise self._errbox[0]
                    return
                yield item
        finally:
            self.close()


class DataLoader:
    """Batched iteration over a ``Dataset`` with fancy-index fetch.

    Reference surface: `DeepFlows/utils/data/dataloader.py:60-123`.  Extras:
    ``drop_last`` (static batch shapes avoid XLA retraces), ``collate_fn``
    (runs on the prefetch thread — put augmentation here), ``device``
    (stage batches onto an accelerator ahead of consumption), ``sampler``
    (custom index stream).
    """

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
        sampler=None,
        device=None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.prefetch_size = max(0, int(prefetch_size))
        self.as_contiguous = as_contiguous
        self.collate_fn = collate_fn
        self.device = device
        # `sampler` is the single source of truth for iteration order —
        # replacing loader.sampler (the reference's surface) takes effect on
        # the next epoch
        self.sampler = sampler if sampler is not None else (
            RandomSampler(dataset, seed=seed) if shuffle else SequentialSampler(dataset)
        )

    @property
    def batch_sampler(self):
        """Chunked view over the CURRENT ``self.sampler``."""
        return BatchSampler(self.sampler, self.batch_size, self.drop_last)

    # -- index planning -------------------------------------------------
    def _plan(self):
        """Yield per-batch index lists for one epoch (driven by
        ``self.sampler`` so custom/replaced samplers are honored)."""
        yield from self.batch_sampler

    # -- batch assembly (runs on the prefetch thread when enabled) ------
    def _assemble(self, idx):
        batch = self.dataset[idx]
        if self.collate_fn is not None:
            batch = self.collate_fn(batch)
        if self.as_contiguous and isinstance(batch, tuple):
            batch = tuple(
                np.ascontiguousarray(part) if isinstance(part, np.ndarray) else part
                for part in batch
            )
        if self.device is not None:
            batch = _stage(batch, self.device)
        return batch

    def __iter__(self):
        plan = self._plan()
        if self.prefetch_size > 0:
            return iter(_Prefetcher(plan, self._assemble, self.prefetch_size))
        return map(self._assemble, plan)

    def __len__(self):
        return len(self.batch_sampler)


def _stage(batch, device):
    """Asynchronously place a batch on ``device`` (True → first jax device)."""
    import jax

    if device is True:
        device = jax.devices()[0]
    if isinstance(batch, tuple):
        return tuple(jax.device_put(part, device) for part in batch)
    return jax.device_put(batch, device)


def data_loader(
    X,
    y,
    batch_size,
    shuffle=False,
    prefetch_size: int = 0,
    as_contiguous: bool = True,
    drop_last: bool = False,
    collate_fn=None,
    device=None,
    seed=None,
):
    """Convenience wrapper over in-memory arrays (reference surface:
    `dataloader.py:126-139`).  ``drop_last`` keeps batch shapes static for
    XLA; ``device`` turns on ahead-of-time device staging."""
    return DataLoader(
        TensorDataset(X, y),
        batch_size,
        shuffle,
        drop_last=drop_last,
        prefetch_size=prefetch_size,
        as_contiguous=as_contiguous,
        collate_fn=collate_fn,
        device=device,
        seed=seed,
    )
