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
    """Background-thread prefetch with clean early-abandonment.

    If the consumer stops iterating early (e.g. a training-step exception
    mid-epoch), `close()` — also called by __del__ and on context-manager
    exit — unblocks and stops the worker so the thread and the remaining
    pipeline don't leak for the life of the process."""

    _SENTINEL = object()

    def __init__(self, inner: Iterable, max_queue_size: int = 5):
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_queue_size)
        self._error = None
        self._closed = threading.Event()

        def worker():
            try:
                for item in inner:
                    # Bounded put that re-checks the closed flag so an
                    # abandoned consumer can't strand us on a full queue.
                    while not self._closed.is_set():
                        try:
                            self._queue.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._closed.is_set():
                        return
            except BaseException as e:  # propagate into the consumer thread
                self._error = e
            finally:
                while not self._closed.is_set():
                    try:
                        self._queue.put(self._SENTINEL, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Stop the worker; safe to call multiple times."""
        self._closed.set()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        self.close()

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
