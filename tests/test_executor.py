"""Worker-pool dispatch tests (reference: THREAD_COUNT pool + blocked-client
command handoff, src/lib.rs; MAX_QUEUED_QUERIES backpressure,
src/graph_core.rs:863-883)."""

import threading
import time

import pytest

from falkordb_tpu.server.executor import ExecutorShutDown, QueryExecutor


def test_submit_runs_on_worker_and_returns():
    ex = QueryExecutor(thread_count=2)
    try:
        assert ex.submit(lambda: 41 + 1) == 42
        main = threading.get_ident()
        assert ex.submit(threading.get_ident) != main
    finally:
        ex.shutdown()


def test_exceptions_propagate_to_caller():
    ex = QueryExecutor(thread_count=1)
    try:
        with pytest.raises(ZeroDivisionError):
            ex.submit(lambda: 1 / 0)
        assert ex.submit(lambda: "ok") == "ok"  # worker survives
    finally:
        ex.shutdown()


def test_concurrent_reads_overlap():
    """Two slow tasks on a 2-worker pool finish in ~1x, not 2x."""
    ex = QueryExecutor(thread_count=2)
    try:
        t0 = time.monotonic()
        threads = [threading.Thread(target=lambda: ex.submit(
            lambda: time.sleep(0.2))) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert time.monotonic() - t0 < 0.38
    finally:
        ex.shutdown()


def test_bounded_queue_rejects():
    ex = QueryExecutor(thread_count=1, max_pending=1)
    release = threading.Event()
    started = threading.Event()

    def blocker():
        started.set()
        release.wait(5)

    t = threading.Thread(target=lambda: ex.submit(blocker))
    t.start()
    started.wait(5)
    # worker busy; fill the single queue slot
    t2 = threading.Thread(target=lambda: ex.submit(lambda: None))
    t2.start()
    deadline = time.monotonic() + 5
    while ex.pending() < 1 and time.monotonic() < deadline:
        time.sleep(0.01)
    with pytest.raises(RuntimeError, match="Max pending"):
        ex.submit(lambda: None)
    release.set()
    t.join()
    t2.join()
    ex.shutdown()


def test_shutdown_rejects_new_work():
    ex = QueryExecutor(thread_count=1)
    ex.shutdown()
    with pytest.raises(ExecutorShutDown):
        ex.submit(lambda: None)


def test_inline_mode():
    ex = QueryExecutor(thread_count=0)
    assert ex.submit(threading.get_ident) == threading.get_ident()


def test_server_queries_through_pool():
    """End-to-end: concurrent GRAPH.QUERY commands through the TCP server
    execute on pool workers and interleave."""
    import socket

    from falkordb_tpu.server.server import GraphServer

    srv = GraphServer(port=0).start()
    try:
        def q(query):
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=10)
            try:
                payload = (f"*3\r\n$11\r\nGRAPH.QUERY\r\n$1\r\ng\r\n"
                           f"${len(query)}\r\n{query}\r\n").encode()
                s.sendall(payload)
                out = b""
                s.settimeout(10)
                while not out.endswith(b"\r\n"):
                    chunk = s.recv(65536)
                    if not chunk:
                        break
                    out += chunk
                return out
            finally:
                s.close()

        q("CREATE (:N {v: 1})")
        outs = []
        threads = [threading.Thread(
            target=lambda: outs.append(q("MATCH (n:N) RETURN n.v")))
            for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(outs) == 8
        assert all(b"1" in o for o in outs)
    finally:
        srv.stop()
