"""Background batch prefetching for the host input pipeline.

The reference overlaps host data prep with device compute via torch
DataLoader worker processes (``num_workers``,
``/root/reference/data/multimodal_data.py:389-405``). The TPU-native
pipeline's loaders are cheap in-memory iterators, so a single daemon thread
with a small bounded queue is enough to hide host batch assembly behind the
device step — no pickling, no worker processes, and exceptions surface in
the consumer exactly where the failing batch would have been used.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Iterable, Iterator

__all__ = ["PrefetchLoader"]

_END = object()


class PrefetchLoader:
    """Iterate ``source`` on a background thread, ``depth`` batches ahead.

    Each ``__iter__`` starts a fresh daemon thread over ``iter(source)``, so
    a re-iterable loader (e.g. `ArrayLoader`) can be wrapped once and
    iterated every epoch. Producer exceptions are captured and re-raised in
    the consuming thread.
    """

    def __init__(self, source: Iterable[Any], depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self.source = source
        self.depth = depth

    def __iter__(self) -> Iterator[Any]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)

        def produce():
            try:
                for item in self.source:
                    q.put(item)
            except BaseException as exc:  # propagate to the consumer
                q.put((_END, exc))
            else:
                q.put((_END, None))

        thread = threading.Thread(target=produce, daemon=True,
                                  name="atq-prefetch")
        thread.start()
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 \
                    and item[0] is _END:
                exc = item[1]
                thread.join()
                if exc is not None:
                    raise exc
                return
            yield item

    def __len__(self) -> int:
        return len(self.source)  # type: ignore[arg-type]
