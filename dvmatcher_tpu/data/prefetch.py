"""Host->device input prefetching.

The feed (geodesic column slabs + clouds) is serialised by the host; a
producer thread runs the batch assembly + device_put for the NEXT batch
while the device executes the current step, hiding transfer latency behind
compute. (The reference relies on torch DataLoader workers for the same
role — but then blocks on per-step CPU work inside its loss.)
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator


def prefetch(
    it: Iterable,
    transform: Callable | None = None,
    size: int = 2,
) -> Iterator:
    """Yield transform(item) for item in it, computed `size` items ahead on
    a daemon thread. Exceptions propagate to the consumer."""
    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def producer():
        try:
            for item in it:
                out = transform(item) if transform else item
                while not stop.is_set():
                    try:
                        q.put(out, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface errors in the consumer
            q.put(e)
            return
        q.put(_END)

    threading.Thread(target=producer, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer stopped early (e.g. max_steps): unblock the producer so
        # it exits cleanly instead of dying mid-put at interpreter teardown
        stop.set()
        while not q.empty():
            q.get_nowait()
