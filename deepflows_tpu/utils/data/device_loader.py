"""DeviceDataLoader: stage batches onto the accelerator one step ahead.

`jax.device_put` is asynchronous, so staging batch N+1 while the compiled
step crunches batch N overlaps host→device transfer with compute — the
practical input-pipeline lever for training loops feeding a TPU (the
reference's prefetch buffer only overlapped host-side indexing,
`DeepFlows/utils/data/dataloader.py:60-95`)."""

from __future__ import annotations

import jax


class DeviceDataLoader:
    def __init__(self, loader, device=None):
        self.loader = loader
        self.device = device or jax.devices()[0]

    def _stage(self, batch):
        if isinstance(batch, tuple):
            return tuple(jax.device_put(b, self.device) for b in batch)
        return jax.device_put(batch, self.device)

    def __iter__(self):
        it = iter(self.loader)
        try:
            nxt = self._stage(next(it))
        except StopIteration:
            return
        for batch in it:
            cur, nxt = nxt, self._stage(batch)  # stage ahead, then yield
            yield cur
        yield nxt

    def __len__(self):
        return len(self.loader)
