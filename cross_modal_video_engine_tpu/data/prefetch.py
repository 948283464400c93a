"""Host-side prefetching iterator.

The reference keeps GPUs fed with torch DataLoader worker processes; here
a background thread pool runs decode/collate ahead of the training step
and `device_put` overlaps host->device transfer with compute (double
buffering).  cv2/libav decode releases the GIL, so threads scale.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap any batch iterator; `depth` batches are produced ahead by a
    background thread and placed on device."""

    _END = object()

    def __init__(self, iterable: Iterable, depth: int = 2,
                 device_put: bool = True, sharding=None):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._device_put = device_put
        self._sharding = sharding
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(iterable),), daemon=True)
        self._thread.start()

    def _place(self, batch):
        if not self._device_put:
            return batch
        if self._sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, self._sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def _worker(self, it: Iterator):
        try:
            for batch in it:
                self._q.put(self._place(batch))
        except BaseException as e:        # surface worker errors to consumer
            self._err = e
        finally:
            self._q.put(self._END)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._END:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def prefetch(iterable: Iterable, depth: int = 2, device_put: bool = True,
             sharding=None) -> PrefetchIterator:
    return PrefetchIterator(iterable, depth, device_put, sharding)
