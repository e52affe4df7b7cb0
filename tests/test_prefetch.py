"""DevicePrefetcher: ordering, exception propagation, clean shutdown."""

import time

import numpy as np
import pytest

from mint_tpu.data.prefetch import DevicePrefetcher


def test_order_and_placement_preserved():
    items = [{"x": np.full((2, 2), i)} for i in range(20)]
    seen = []

    def place(b):
        seen.append(int(b["x"][0, 0]))
        return {k: v + 100 for k, v in b.items()}

    pf = DevicePrefetcher(iter(items), place, depth=3)
    out = [int(b["x"][0, 0]) for b in pf]
    assert out == [100 + i for i in range(20)]
    assert seen == list(range(20))  # placed in order, exactly once
    pf.close()


def test_upstream_exception_propagates():
    def gen():
        yield {"x": np.zeros(1)}
        raise RuntimeError("loader blew up")

    pf = DevicePrefetcher(gen(), lambda b: b, depth=2)
    next(pf)
    with pytest.raises(RuntimeError, match="loader blew up"):
        next(pf)
    pf.close()


def test_close_unblocks_endless_upstream():
    def endless():
        while True:
            yield {"x": np.zeros(1)}

    pf = DevicePrefetcher(endless(), lambda b: b, depth=2)
    next(pf)
    t0 = time.time()
    pf.close()
    assert time.time() - t0 < 5
    assert not pf._thread.is_alive()


def test_close_calls_upstream_close():
    class Loader:
        closed = False

        def __iter__(self):
            return self

        def __next__(self):
            return {"x": np.zeros(1)}

        def close(self):
            self.closed = True

    loader = Loader()
    pf = DevicePrefetcher(loader, lambda b: b, depth=2)
    next(pf)
    pf.close()
    assert loader.closed


def test_overlaps_production_with_consumption():
    """With depth 2, the producer works ahead while the consumer is busy:
    total wall time must approach max(produce, consume), not the sum."""
    def slow_gen():
        for i in range(8):
            time.sleep(0.05)
            yield {"x": np.full(1, i)}

    pf = DevicePrefetcher(slow_gen(), lambda b: b, depth=2)
    t0 = time.time()
    for _ in range(8):
        next(pf)
        time.sleep(0.05)  # consumer work
    elapsed = time.time() - t0
    pf.close()
    # Serial would be ~0.8 s; overlapped ~0.45 s. Allow CI slack.
    assert elapsed < 0.7, elapsed

def test_exhaustion_and_error_repeat_on_next():
    """Iterator contract: StopIteration (and a propagated producer error)
    must repeat on EVERY subsequent next() — the _DONE sentinel is queued
    once, so a retrying consumer used to hang forever on the empty
    queue."""
    pf = DevicePrefetcher(iter([{"x": 1}]), lambda b: b)
    assert next(pf) == {"x": 1}
    for _ in range(3):
        try:
            next(pf)
            assert False, "expected StopIteration"
        except StopIteration:
            pass

    def boom():
        raise IOError("bad shard")
        yield  # pragma: no cover

    pf2 = DevicePrefetcher(boom(), lambda b: b)
    for _ in range(3):
        try:
            next(pf2)
            assert False, "expected IOError"
        except IOError:
            pass


def test_close_with_blocked_producer_keeps_upstream_alive():
    """If the producer thread is still stuck inside next(upstream) after
    the join timeout, close() must NOT free the upstream under it
    (use-after-free with the native loader's C++ handle)."""
    import threading

    release = threading.Event()

    class Blocking:
        closed = False

        def __iter__(self):
            return self

        def __next__(self):
            release.wait(timeout=30)
            raise StopIteration

        def close(self):
            self.closed = True

    up = Blocking()
    pf = DevicePrefetcher(up, lambda b: b)
    time.sleep(0.1)  # let the producer block inside next(upstream)
    pf._thread.join(timeout=0)  # it is alive
    assert pf._thread.is_alive()
    orig_join = pf._thread.join
    pf._thread.join = lambda timeout=None: orig_join(timeout=0.2)
    pf.close()
    assert not up.closed  # left alive for the blocked thread
    release.set()


def test_next_after_close_stops_instead_of_hanging():
    """A straggling consumer calling next() after close() must see
    StopIteration — the stopped producer never queues its done marker,
    so an un-flagged consumer blocked forever on the empty queue."""
    import itertools
    import pytest

    from mint_tpu.data.prefetch import DevicePrefetcher

    pf = DevicePrefetcher(itertools.count(), place=lambda x: x, depth=2)
    assert next(pf) == 0
    pf.close()
    with pytest.raises(StopIteration):
        next(pf)


def test_close_does_not_advance_upstream_again():
    """Once close() is observed, the producer must not pull one more
    (possibly slow, blocking) item from the upstream iterator."""
    import time

    from mint_tpu.data.prefetch import DevicePrefetcher

    pulls = []

    def upstream():
        i = 0
        while True:
            pulls.append(i)
            yield i
            i += 1

    pf = DevicePrefetcher(upstream(), place=lambda x: x, depth=1)
    # Let the producer fill the depth-1 queue and park in its put loop.
    assert next(pf) == 0
    time.sleep(0.3)
    before = len(pulls)
    pf.close()
    time.sleep(0.3)
    # At most the in-flight item; no FURTHER pull after stop was set.
    assert len(pulls) <= before + 1
    assert not pf._thread.is_alive()


def test_close_wakes_consumer_parked_in_get():
    # A consumer blocked inside q.get() (it passed the _done check
    # before close() set it) must see StopIteration, not hang: close()
    # queues a final _DONE sentinel after draining.
    import threading

    def one_then_slow():
        yield {"x": np.zeros(1)}
        time.sleep(30)  # producer wedged: queue stays empty
        yield {"x": np.zeros(1)}

    pf = DevicePrefetcher(one_then_slow(), lambda b: b, depth=2)
    next(pf)
    result = {}

    def consume():
        try:
            next(pf)
            result["got"] = "item"
        except StopIteration:
            result["got"] = "stop"

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.3)  # let the consumer park in q.get()
    pf.close()
    t.join(timeout=10)
    assert not t.is_alive(), "consumer never woke after close()"
    assert result["got"] == "stop"
