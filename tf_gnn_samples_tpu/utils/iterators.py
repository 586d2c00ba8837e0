"""Host-side async input pipeline.

Replacement for dpu_utils' ThreadedIterator (used by the reference for
minibatch prefetch with queue depth 5, models/sparse_graph_model.py:272):
a background thread runs the (numpy-heavy) batch packing/padding while the
device executes the previous step, hiding host batch-prep latency.
"""

import queue
import threading
from typing import Iterable, Iterator


class ThreadedIterator(Iterator):
    _SENTINEL = object()

    def __init__(self, inner: Iterable, max_queue_size: int = 5):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue_size)
        self._error = None

        def worker():
            try:
                for item in inner:
                    self._queue.put(item)
            except BaseException as e:  # propagate into the consumer thread
                self._error = e
            finally:
                self._queue.put(self._SENTINEL)

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            self._thread.join()
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item
