"""Server + client over a real TCP socket (the reference's flow-test
pattern: spawn server, drive through the wire protocol, tests/common.py)."""

import pytest

from falkordb_tpu.server import GraphServer, connect
from falkordb_tpu.server.resp import RespError
from falkordb_tpu.runtime.value import NodeVal, EdgeVal


@pytest.fixture(scope="module")
def server():
    s = GraphServer(port=0).start()  # ephemeral port
    yield s
    s.stop()


@pytest.fixture
def client(server):
    c = connect(port=server.port)
    yield c
    c.close()


def test_ping_hello(client):
    assert client.ping()
    hello = client.execute("HELLO")
    assert b"falkordb-tpu" in hello or "falkordb-tpu" in [
        x.decode() if isinstance(x, bytes) else x for x in hello]


def test_query_roundtrip(client):
    g = client.select_graph("wire")
    r = g.query("CREATE (:Person {name:'Ann', age: 34})-[:KNOWS {since:2020}]"
                "->(:Person {name:'Bob'})")
    assert r.stats["nodes_created"] == 2
    assert r.stats["relationships_created"] == 1
    r = g.query("MATCH (a:Person)-[k:KNOWS]->(b) RETURN a, k, b.name")
    assert r.header == ["a", "k", "b.name"]
    a, k, bname = r.result_set[0]
    assert isinstance(a, NodeVal) and a.labels == ["Person"]
    assert a.properties == {"name": "Ann", "age": 34}
    assert isinstance(k, EdgeVal) and k.relation == "KNOWS"
    assert k.properties == {"since": 2020}
    assert bname == "Bob"


def test_scalar_types_roundtrip(client):
    g = client.select_graph("wire2")
    r = g.query("RETURN 1, 1.5, 'x', true, null, [1,'a'], {k: 2}")
    row = r.result_set[0]
    assert row == [1, 1.5, "x", True, None, [1, "a"], {"k": 2}]


def test_params_over_wire(client):
    g = client.select_graph("wire3")
    r = g.query("RETURN $a + $b", params={"a": 1, "b": 2})
    assert r.result_set == [[3]]
    r = g.query("RETURN $s", params={"s": "it's"})
    assert r.result_set == [["it's"]]


def test_ro_query_rejects_write(client):
    g = client.select_graph("wire4")
    with pytest.raises(RespError):
        g.ro_query("CREATE (:X)")


def test_explain_and_profile(client):
    g = client.select_graph("wire5")
    g.query("CREATE (:E)")
    assert "Node By Label Scan" in g.explain("MATCH (n:E) RETURN n")
    assert "Records produced" in g.profile("MATCH (n:E) RETURN n")


def test_graph_list_delete_copy(client):
    g = client.select_graph("wire6")
    g.query("CREATE (:A {v: 7})")
    assert "wire6" in client.list_graphs()
    client.execute("GRAPH.COPY", "wire6", "wire6copy")
    g2 = client.select_graph("wire6copy")
    assert g2.query("MATCH (n:A) RETURN n.v").result_set == [[7]]
    client.execute("GRAPH.DELETE", "wire6copy")
    assert "wire6copy" not in client.list_graphs()


def test_config(client):
    client.config_set("RESULTSET_SIZE", 10)
    out = client.config_get("RESULTSET_SIZE")
    assert int(out[1]) == 10
    client.config_set("RESULTSET_SIZE", -1)


def test_constraint_over_wire(client):
    g = client.select_graph("wire7")
    g.query("CREATE (:U {k: 1}), (:U {k: 2})")
    r = client.execute("GRAPH.CONSTRAINT", "CREATE", "wire7", "UNIQUE",
                       "NODE", "U", "PROPERTIES", "1", "k")
    assert str(r) == "PENDING"
    with pytest.raises(RespError):
        g.query("CREATE (:U {k: 1})")  # violates unique
    client.execute("GRAPH.CONSTRAINT", "DROP", "wire7", "UNIQUE",
                   "NODE", "U", "PROPERTIES", "1", "k")
    g.query("CREATE (:U {k: 1})")  # now allowed


def test_unknown_command(client):
    with pytest.raises(RespError):
        client.execute("NOSUCH.CMD")


def test_slowlog_memory(client):
    g = client.select_graph("wire8")
    g.query("CREATE (:S)")
    out = client.execute("GRAPH.MEMORY", "USAGE", "wire8")
    assert b"nodes" in out or "nodes" in [
        x.decode() if isinstance(x, bytes) else x for x in out]


def test_telemetry_stream(client):
    g = client.select_graph("tele")
    g.query("CREATE (:T {v: 1})")
    g.query("MATCH (t:T) RETURN t.v")
    g.query("MATCH (t:T) RETURN t.v")  # plan-cache hit
    n = client.execute("XLEN", "telemetry{tele}")
    assert n >= 3
    entries = client.execute("XRANGE", "telemetry{tele}", "-", "+")
    assert len(entries) == n
    _id, fields = entries[-1]
    d = dict(zip(fields[::2], fields[1::2]))
    d = {(k.decode() if isinstance(k, bytes) else k):
         (v.decode() if isinstance(v, bytes) else v) for k, v in d.items()}
    assert d["query"] == "MATCH (t:T) RETURN t.v"
    assert d["write"] == "False"
    assert d["utilized_cache"] == "True"
    assert float(d["execution_duration_ms"]) >= 0.0
    assert d["timed_out"] == "False"


def test_graph_debug_aux(client):
    g = client.select_graph("dbg")
    g.query("UNWIND range(1, 30) AS i CREATE (:D {v: i})")
    assert client.execute("GRAPH.DEBUG", "AUX", "START") == 1
    assert client.execute("GRAPH.DEBUG", "AUX", "END") == 0
    with pytest.raises(RespError):
        client.execute("GRAPH.DEBUG", "NOPE", "X")


def test_cached_execution_flag(client):
    g = client.select_graph("cachef")
    g.query("CREATE (:C {v:1})")
    r1 = g.query("MATCH (c:C) RETURN c.v")
    r2 = g.query("MATCH (c:C) RETURN c.v")
    assert r2.result_set == [[1]]
