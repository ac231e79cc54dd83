"""Double-buffered host→HBM input pipeline.

For scenes that fit in HBM, splits are device-resident (the default —
see data/scene.py). For larger-than-HBM datasets (e.g. full-resolution
Cambridge GreatCourt), this iterator overlaps host-side batch assembly
and `jax.device_put` with device compute: a background thread keeps a
small queue of device-committed batches ahead of the consumer — the
TPU-native replacement for the reference's torch DataLoader worker pool
(reference: dataset_loaders/load_7Scenes.py:488-491).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class PrefetchIterator:
    """Iterate batches produced by `make_batch(idx)` with `depth` batches
    device-committed ahead of the consumer.

    make_batch: index → pytree of numpy arrays (host).
    order: iterable of indices (e.g. a shuffled epoch permutation).
    """

    def __init__(self, make_batch: Callable, order, depth: int = 2,
                 device=None):
        self._make_batch = make_batch
        self._order = list(order)
        self._device = device or jax.devices()[0]
        self._q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        try:
            for idx in self._order:
                host = self._make_batch(idx)
                dev = jax.tree.map(
                    lambda x: jax.device_put(np.asarray(x), self._device), host)
                self._q.put(dev)
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def __len__(self):
        return len(self._order)


def epoch_prefetch(split, batch_size: int, rng: np.random.Generator,
                   depth: int = 2, drop_last: bool = True) -> PrefetchIterator:
    """Shuffled epoch iterator over a Split, yielding device-resident
    (images, poses, hists) batches."""
    n = len(split)
    order = rng.permutation(n)
    nb = n // batch_size if drop_last else -(-n // batch_size)
    batches = [order[i * batch_size:(i + 1) * batch_size] for i in range(nb)]

    def make(idx_arr):
        return (split.images[idx_arr], split.poses[idx_arr], split.hists[idx_arr])

    return PrefetchIterator(make, batches, depth=depth)
