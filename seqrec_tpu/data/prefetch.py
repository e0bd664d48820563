"""Host→device prefetch (SURVEY.md §2 #16, "streaming per-host pipeline").

``DevicePrefetcher`` decouples host batch assembly + the H2D copy from the
training hot loop: a background thread pulls ``(bucket, host_batch)`` pairs
from the source iterator, stages each batch onto the device with the caller's
``put_batch`` (typically ``jax.device_put`` with the batch sharding), and
parks up to ``depth`` staged batches in a bounded queue. The consumer side is
a plain iterator yielding ``(bucket, device_batch)`` in source order, so
``Trainer.fit`` (trainer.py:486-497) can overlap step N's compute with step
N+1..N+depth's host work and transfers.

Semantics (tested in tests/unit/test_prefetch.py):
  * order and values are preserved exactly;
  * an exception raised by the source (or by ``put_batch``) surfaces in the
    consumer at the position it occurred, not earlier;
  * source exhaustion -> ``StopIteration``;
  * ``close()`` never hangs: it drains/unblocks a feeder stuck on a full
    queue and joins the thread, even for infinite sources.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Tuple

# Queue sentinel kinds. Tuples are (kind, payload) so a single bounded queue
# carries data, termination, and errors in order.
_ITEM = 0
_END = 1
_ERROR = 2


class DevicePrefetcher:
    """Background device-staging iterator over ``(bucket, batch)`` pairs."""

    def __init__(
        self,
        source: Iterator[Tuple[Any, Any]],
        put_batch: Callable[[Any], Any],
        depth: int = 2,
    ):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._source = source
        self._put = put_batch
        # +1 slot so the terminal _END/_ERROR marker never blocks the feeder
        # behind `depth` staged batches.
        self._q: "queue.Queue" = queue.Queue(maxsize=depth + 1)
        self._closed = threading.Event()
        self._exhausted = False
        self._thread = threading.Thread(
            target=self._feed, name="seqrec-device-prefetch", daemon=True
        )
        self._thread.start()

    # ---- feeder thread ----------------------------------------------------

    def _feed(self) -> None:
        try:
            for bucket, host_batch in self._source:
                if self._closed.is_set():
                    return
                staged = self._put(host_batch)
                self._offer((_ITEM, (bucket, staged)))
                if self._closed.is_set():
                    return
            self._offer((_END, None))
        except BaseException as e:  # noqa: BLE001 - must cross threads intact
            self._offer((_ERROR, e))

    def _offer(self, item) -> None:
        """put() that gives up promptly once close() is requested, so a full
        queue never wedges the feeder (test_close_unblocks_full_queue_feeder)."""
        while not self._closed.is_set():
            try:
                self._q.put(item, timeout=0.05)
                return
            except queue.Full:
                continue

    # ---- consumer side ----------------------------------------------------

    def __iter__(self) -> "DevicePrefetcher":
        return self

    def __next__(self) -> Tuple[Any, Any]:
        if self._exhausted:
            raise StopIteration
        if self._closed.is_set():
            raise StopIteration
        kind, payload = self._q.get()
        if kind == _ITEM:
            return payload
        self._exhausted = True
        if kind == _ERROR:
            raise payload
        raise StopIteration

    def close(self) -> None:
        """Stop the feeder and reclaim the thread. Idempotent, non-blocking
        beyond a short join; safe to call from any thread."""
        self._closed.set()
        # Drain so a feeder blocked in _offer sees the flag at its next retry
        # and so staged device batches are dropped promptly.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        if self._thread.is_alive():
            self._thread.join(timeout=5.0)
