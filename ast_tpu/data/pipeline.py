"""Background-prefetching batch pipeline.

The reference's DataLoader runs with num_workers=0 — fully synchronous
host-side loading with the CPU-bound librosa CQT inline (dataloader.py:172,
SURVEY.md §2.3). Here host work is only wav decode (native C++), features run
on-device, and a daemon thread keeps `depth` decoded batches ready so the
accelerator never waits on the host."""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator


class Prefetcher:
    """Wrap a batch iterator factory with a depth-N background thread."""

    def __init__(self, make_iterator: Callable[[], Iterator], depth: int = 2):
        self._make = make_iterator
        self._depth = depth

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self._depth)
        sentinel = object()
        err_box = []

        def worker():
            try:
                for item in self._make():
                    q.put(item)
            except BaseException as e:  # surface worker errors to the consumer
                err_box.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err_box:
                    raise err_box[0]
                return
            yield item


def prefetch(make_iterator: Callable[[], Iterator], depth: int = 2):
    return iter(Prefetcher(make_iterator, depth))
