"""Single-slot background prefetch over a host iterator.

The reference's input pipeline is synchronous (torch DataLoader with
num_workers=0 by default); here the trainers wrap their batch stream in
`prefetch` so host-side batch assembly and host->device transfer overlap the
device step (SURVEY.md §7: host-parallel input pipeline). One worker thread
is enough — batches are small and the device step dominates.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


def prefetch(iterable: Iterable[T], depth: int = 2) -> Iterator[T]:
    """Iterate `iterable` on a daemon thread, keeping up to `depth` items
    ready. Exceptions raised by the source re-raise at the consuming site.
    If the consumer abandons the generator (exception in the train loop,
    early break), the worker is unblocked and told to stop — otherwise it
    would sit on q.put forever pinning a device batch."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as exc:  # propagate to the consumer
            if not stop.is_set():
                q.put((_SENTINEL, exc))
        else:
            if not stop.is_set():
                q.put((_SENTINEL, None))

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if (isinstance(item, tuple) and len(item) == 2
                    and item[0] is _SENTINEL):
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        stop.set()
