"""Multi-server cluster key-sharding (VERDICT r3 missing #7).

Graphs pin to shards by redis-cluster slot; UDFs broadcast cluster-wide
(/root/reference/tests/flow/test_udf_cluster.py:6-10)."""

import pytest

from falkordb_tpu.api import FalkorDB
from falkordb_tpu.server.cluster import ClusterClient, crc16, key_slot
from falkordb_tpu.server.server import GraphServer


def test_crc16_redis_vector():
    # the reference vector from the redis cluster spec
    assert crc16(b"123456789") == 0x31C3


def test_hash_tags_coslot():
    assert key_slot("{user1000}.following") == key_slot("{user1000}.followers")
    # empty tag falls back to the whole key
    assert key_slot("foo{}bar") != key_slot("")


@pytest.fixture
def cluster():
    servers = [GraphServer(port=0, db=FalkorDB()).start() for _ in range(3)]
    cc = ClusterClient([("127.0.0.1", s.port) for s in servers])
    yield cc, servers
    cc.close()
    for s in servers:
        s.stop()


def test_graphs_pin_to_owning_shard(cluster):
    cc, servers = cluster
    names = [f"g{i}" for i in range(9)]
    for nm in names:
        g = cc.select_graph(nm)
        g.query("CREATE (:T {name: $n})", params={"n": nm})
    # every graph exists on exactly its owning shard
    for nm in names:
        owner = cc.shard_of(nm)
        for i, s in enumerate(servers):
            present = nm in s.db.list_graphs()
            assert present == (i == owner), (nm, i, owner)
    # the union view sees them all
    assert set(cc.list_graphs()) >= set(names)
    # reads route back to the same shard
    for nm in names:
        res = cc.select_graph(nm).query("MATCH (t:T) RETURN t.name")
        assert res.result_set == [[nm]]


def test_keyed_commands_route(cluster):
    cc, servers = cluster
    cc.select_graph("route_me").query("CREATE (:X)")
    owner = cc.shard_of("route_me")
    assert "route_me" in servers[owner].db.list_graphs()
    cc.execute("GRAPH.DELETE", "route_me")
    assert "route_me" not in servers[owner].db.list_graphs()


def test_udf_broadcast_serves_any_shard(cluster):
    cc, servers = cluster
    code = "falkor.register('double', lambda x: x * 2)"
    cc.udf_load("mylib", code)
    # pick graph names that land on different shards
    picked, seen = [], set()
    i = 0
    while len(picked) < len(servers) and i < 200:
        nm = f"u{i}"
        sh = cc.shard_of(nm)
        if sh not in seen:
            seen.add(sh)
            picked.append(nm)
        i += 1
    assert len(picked) == len(servers)
    for nm in picked:
        g = cc.select_graph(nm)
        res = g.query("RETURN mylib.double(21)")
        assert res.result_set == [[42]]
