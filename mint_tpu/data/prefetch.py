"""Background device prefetch for training input.

The train loop's critical path is otherwise: next(loader) on host ->
shard_batch (host->device transfer) -> train_step.  On hosts where the
transfer is slow relative to the step (e.g. a tunneled chip, or big
batches over PCIe), serializing these costs real throughput.  This
wrapper runs the loader + transfer in a daemon thread, keeping `depth`
batches already resident on device, so the accelerator never waits on
the host (the standard JAX input-pipeline recipe; the reference gets
the equivalent from ``dataset.prefetch(1)`` at reference
``mint/core/inputs.py:122`` — under ``TPUStrategy``, tf.data's
prefetch-to-device).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional


class DevicePrefetcher:
    """Iterator wrapper: applies `place` (e.g. Trainer.shard_batch) to
    upstream items in a background thread, `depth` items ahead."""

    _DONE = object()

    def __init__(self, upstream: Iterator, place: Callable, depth: int = 2):
        self._upstream = upstream
        self._place = place
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._done = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            upstream = iter(self._upstream)
            while not self._stop.is_set():
                # Check stop BEFORE advancing the upstream: after a
                # close() observed inside the put-retry loop, one more
                # blocking next(upstream) (a slow/cold native-loader
                # read) is what used to push close()'s join(5) into its
                # leak path.
                try:
                    item = next(upstream)
                except StopIteration:
                    break
                placed = self._place(item)
                while not self._stop.is_set():
                    try:
                        self._q.put(placed, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # propagate into the consumer
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(self._DONE, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            # Iterator contract: exhaustion/error must repeat on every
            # subsequent next() — the producer only queues _DONE once.
            if self._err is not None:
                raise self._err
            raise StopIteration
        item = self._q.get()
        if item is self._DONE:
            self._done = True
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # A straggling consumer must see StopIteration, not block
        # forever on an empty queue the stopped producer will never
        # feed (the producer skips its _DONE marker once stop is set).
        self._done = True
        # Drain so the producer unblocks, then join.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        # Wake a consumer that passed the _done check and is already
        # parked in q.get(): the stopped producer skips its own _DONE
        # marker, so queue one here.  (If the queue refilled meanwhile,
        # the parked consumer gets a real item and the NEXT call sees
        # self._done.)
        try:
            self._q.put_nowait(self._DONE)
        except queue.Full:
            pass
        self._thread.join(timeout=5)
        if self._thread.is_alive():
            # The producer is still blocked inside next(upstream) (e.g.
            # the native loader reading a slow disk).  Closing the
            # upstream now would free the C++ loader handle UNDER the
            # blocked thread — use-after-free.  Leak the handle instead;
            # the daemon thread dies with the process.
            return
        close = getattr(self._upstream, "close", None)
        if close is not None:
            close()
