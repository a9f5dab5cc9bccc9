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
    queue of ``depth`` items. Exceptions propagate to the consumer.

    Abandoning the iterator mid-stream (consumer breaks, or an exception
    unwinds the training loop) releases the producer: it checks a stop
    flag between bounded puts, so it can't block forever on a full queue
    pinning the thread and its buffered batches."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def worker() -> None:
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        t.join()
        if err:
            raise err[0]
    finally:
        stop.set()
