"""Query executor pool — worker-thread dispatch for GRAPH.* commands.

The reference hands every GRAPH.QUERY off the Redis main thread to a
worker pool and blocks the client until the worker finishes
(/root/reference/src/lib.rs command handlers spawn onto the pool;
THREAD_COUNT config).  Here the RESP connection thread plays the "main
thread" role: it submits the query to the shared QueryExecutor and blocks
on the ticket.  Workers execute; reads run concurrently on MVCC
snapshots, writes serialize on the per-graph write lock inside GraphCore.

Python's GIL does not serialize the hot path: query compute is XLA
dispatches and numpy kernels, both of which release the GIL.

Bounded queue: past `max_queued_queries` pending tickets the submit is
rejected with the reference's "Max pending queries exceeded" error
instead of queueing unboundedly (graph_core.rs:863-883 backpressure).
"""

from __future__ import annotations

import queue
import threading
import time


class ExecutorShutDown(RuntimeError):
    pass


class _Ticket:
    """A submitted unit of work; the submitter blocks on wait()."""

    __slots__ = ("fn", "done", "result", "error", "enqueued_at", "wait_ms")

    def __init__(self, fn):
        self.fn = fn
        self.done = threading.Event()
        self.result = None
        self.error = None
        self.enqueued_at = time.monotonic()
        self.wait_ms = 0.0

    def wait(self):
        self.done.wait()
        if self.error is not None:
            raise self.error
        return self.result


class QueryExecutor:
    """Fixed-size worker pool with a bounded pending queue.

    thread_count=0 (default in embedded use) executes inline on the
    caller thread — zero overhead for the library API; the server starts
    one with thread_count = config.thread_count.
    """

    def __init__(self, thread_count: int = 4, max_pending: int = 2**31):
        self.thread_count = thread_count
        self.max_pending = max_pending
        self._q: queue.SimpleQueue = queue.SimpleQueue()
        self._pending = 0
        self._lock = threading.Lock()
        self._shutdown = False
        self._workers = []
        for i in range(thread_count):
            t = threading.Thread(target=self._worker, daemon=True,
                                 name=f"graph-worker-{i}")
            t.start()
            self._workers.append(t)

    # ------------------------------------------------------------------ public

    def submit(self, fn):
        """Run fn() on a worker; returns its result (blocks the caller —
        the blocked-client pattern).  Raises fn's exception in the caller."""
        if self.thread_count == 0:
            return fn()
        with self._lock:
            if self._shutdown:
                raise ExecutorShutDown("executor is shut down")
            if self._pending >= self.max_pending:
                raise RuntimeError("Max pending queries exceeded")
            self._pending += 1
        t = _Ticket(fn)
        self._q.put(t)
        return t.wait()

    def pending(self) -> int:
        """Tickets submitted but not yet started (GRAPH.INFO 'Waiting')."""
        with self._lock:
            return self._pending

    def shutdown(self):
        with self._lock:
            self._shutdown = True
        for _ in self._workers:
            self._q.put(None)

    # ------------------------------------------------------------------ worker

    def _worker(self):
        while True:
            t = self._q.get()
            if t is None:
                return
            with self._lock:
                self._pending -= 1
            t.wait_ms = (time.monotonic() - t.enqueued_at) * 1000.0
            try:
                t.result = t.fn()
            except BaseException as e:  # noqa: BLE001 — forwarded to caller
                t.error = e
            finally:
                t.done.set()
