"""Host-pipeline overlap: background-thread batch prefetching.

The reference overlaps assembly with compute via DataLoader worker
*processes* (``scripts/training.py:160``); here a single daemon thread is
enough — batch assembly is vectorized numpy or the C++ assembler (which
releases the GIL inside ctypes calls), so one producer thread keeps a
bounded queue full while the main thread dispatches device steps
asynchronously.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 3) -> Iterator[T]:
    """Iterate ``iterable`` on a daemon thread, yielding through a bounded
    queue of ``depth`` items. Exceptions propagate to the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []

    def worker() -> None:
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        yield item
    t.join()
    if err:
        raise err[0]
