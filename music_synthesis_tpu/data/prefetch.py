"""Background-thread batch prefetcher (SURVEY.md §5.2).

The input pipeline is the only concurrency surface in this functional
framework; it stays single-producer (one thread fills a bounded queue, the
training loop consumes), so there is nothing to race on. Overlaps host-side
segment sampling + host->device transfer with the device step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

__all__ = ["Prefetcher"]


class Prefetcher:
    """Iterate ``make_batch(step)`` for steps [start, end) with lookahead."""

    def __init__(
        self,
        make_batch: Callable[[int], object],
        start: int,
        end: int,
        depth: int = 2,
    ):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._end = end
        self._start = start

        def worker():
            try:
                for step in range(start, end):
                    self._q.put((step, make_batch(step)))
            except BaseException as e:  # surface in consumer
                self._err = e
            finally:
                self._q.put(None)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator[tuple[int, object]]:
        while True:
            item = self._q.get()
            if item is None:
                if self._err is not None:
                    raise self._err
                return
            yield item
