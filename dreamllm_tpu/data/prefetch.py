"""Host→device input pipelining.

Keeps N batches in flight on device while the host builds the next ones —
the role the reference's DataLoader(num_workers, pin_memory) + non-blocking
copies play on GPU. With jax's async dispatch, simply device_putting ahead
of consumption overlaps the transfer with the current step's compute.
"""

from __future__ import annotations

import collections
import threading
from typing import Any, Callable, Iterable, Iterator

import jax


def device_prefetch(
    it: Iterable,
    size: int = 2,
    transfer: Callable[[Any], Any] | None = None,
) -> Iterator:
    """Yield items with ``size`` transfers started ahead.

    ``transfer`` defaults to ``jax.device_put`` (pass a sharding-aware fn for
    multi-device: e.g. ``lambda b: jax.tree.map(jax.device_put, b, shardings)``).
    """
    transfer = transfer or (lambda x: jax.tree.map(jax.device_put, x))
    it = iter(it)
    buf: collections.deque = collections.deque()
    try:
        for _ in range(size):
            buf.append(transfer(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(transfer(next(it)))
        except StopIteration:
            pass
        yield out


def background_iterator(it: Iterable, maxsize: int = 4) -> Iterator:
    """Run the (host-side) iterator in a thread so sample building overlaps
    device compute even when it holds the GIL sparingly (tar decode, numpy)."""
    import queue

    q: queue.Queue = queue.Queue(maxsize=maxsize)
    END = object()
    err: list = []

    def worker():
        try:
            for x in it:
                q.put(x)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is END:
            if err:
                raise err[0]
            return
        yield x
