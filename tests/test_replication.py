"""Effects-based replication tests (reference: tests/flow/test_effects.py +
test_replication.py roles)."""

import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.persist.effects import decode_effects, encode_effects


def make_pair():
    db = FalkorDB()
    primary = db._get_or_create("primary")
    replica = db._get_or_create("replica")
    primary.add_replica(replica.apply_effects_blob)
    return db, primary, replica


def q(core, text, **kw):
    return core.query(text, **kw)


def test_create_replicates():
    db, p, r = make_pair()
    q(p, "CREATE (:Person {name:'Ann', age: 34})-[:KNOWS {since: 2020}]->"
         "(:Person {name:'Bob'})")
    res = q(r, "MATCH (a:Person)-[k:KNOWS]->(b:Person) "
               "RETURN a.name, k.since, b.name, id(a), id(b)")
    assert res.result_set[0][:3] == ["Ann", 2020, "Bob"]
    # replica ids match primary ids exactly
    pres = q(p, "MATCH (a:Person {name:'Ann'}), (b:Person {name:'Bob'}) "
                "RETURN id(a), id(b)")
    assert res.result_set[0][3:] == pres.result_set[0]


def test_update_delete_replicate():
    db, p, r = make_pair()
    q(p, "CREATE (:N {v: 1}), (:N {v: 2})")
    q(p, "MATCH (n:N {v: 1}) SET n.v = 10, n:Tagged")
    q(p, "MATCH (n:N {v: 2}) DETACH DELETE n")
    res = q(r, "MATCH (n:N) RETURN n.v, labels(n)")
    assert len(res.result_set) == 1
    assert res.result_set[0][0] == 10
    assert sorted(res.result_set[0][1]) == ["N", "Tagged"]


def test_property_removal_replicates():
    db, p, r = make_pair()
    q(p, "CREATE (:X {a: 1, b: 2})")
    q(p, "MATCH (n:X) REMOVE n.a")
    res = q(r, "MATCH (n:X) RETURN n.a, n.b")
    assert res.result_set == [[None, 2]]


def test_codec_roundtrip():
    from falkordb_tpu.runtime.value import PointVal, VectorF32

    effects = [
        (1, 7, ["A", "B"], {"s": "x", "i": 3, "f": 1.5, "b": True,
                            "l": [1, "y"], "m": {"k": None},
                            "p": PointVal(1.0, 2.0),
                            "v": VectorF32([1.0, 2.0])}),
        (2, 3, 7, 9, "REL", {"w": 2}),
        (3, 7), (4, 3),
        (5, "node", 7, "attr", 42),
        (6, 7, ["L1"]), (7, 7, ["L2"]),
    ]
    decoded = decode_effects(encode_effects(effects))
    assert decoded == effects


def test_replication_over_wire():
    from falkordb_tpu.server import GraphServer, connect

    s = GraphServer(port=0).start()
    try:
        c = connect(port=s.port)
        # build effects on an in-process primary, ship via GRAPH.EFFECT
        db = FalkorDB()
        p = db._get_or_create("x")
        blobs = []
        p.add_replica(blobs.append)
        p.query("CREATE (:W {v: 1})-[:R]->(:W {v: 2})")
        assert blobs
        payload = blobs[0].decode("utf-8", errors="surrogateescape")
        c.execute("GRAPH.EFFECT", "mirror", payload)
        g = c.select_graph("mirror")
        res = g.query("MATCH (a:W)-[:R]->(b:W) RETURN a.v, b.v")
        assert res.result_set == [[1, 2]]
        c.close()
    finally:
        s.stop()


def test_chained_writes_keep_ids_aligned():
    db, p, r = make_pair()
    q(p, "UNWIND range(1, 20) AS i CREATE (:C {v: i})")
    q(p, "MATCH (n:C {v: 5}) DETACH DELETE n")
    q(p, "CREATE (:C {v: 100})")  # recycles id 4 (v=5's slot) on primary
    pa = q(p, "MATCH (n:C {v: 100}) RETURN id(n)").result_set
    ra = q(r, "MATCH (n:C {v: 100}) RETURN id(n)").result_set
    assert pa == ra
    assert (q(p, "MATCH (n:C) RETURN count(*)").result_set
            == q(r, "MATCH (n:C) RETURN count(*)").result_set)


def test_nondeterministic_write_replicates_via_effects():
    """rand() writes MUST ship effects — verbatim replay would diverge
    (graph_core.rs:1465 should_use_effects)."""
    db = FalkorDB()
    p = db._get_or_create("ndp")
    r = db._get_or_create("ndr")
    kinds = []
    p.add_replica(lambda kind, payload: (
        kinds.append(kind),
        r.apply_effects_blob(payload if kind == "effects" else payload[2])))
    db.config.effects_threshold_us = 10**12  # replay would win on cost...
    q(p, "CREATE (:R {v: rand()})")  # ...but nondeterminism forces effects
    assert kinds == ["effects"]
    pv = q(p, "MATCH (n:R) RETURN n.v").result_set[0][0]
    rv = q(r, "MATCH (n:R) RETURN n.v").result_set[0][0]
    assert pv == rv


def test_bulk_create_replicates_verbatim():
    """A cheap deterministic CREATE under a huge threshold replays the
    query text on the replica instead of shipping effects."""
    db = FalkorDB()
    p = db._get_or_create("vbp")
    r = db._get_or_create("vbr")
    p.add_replica(r)  # full-strategy GraphCore consumer
    db.config.effects_threshold_us = 10**12
    q(p, "UNWIND range(1, 50) AS i CREATE (:B {v: i})")
    assert q(r, "MATCH (b:B) RETURN count(*), sum(b.v)").result_set == \
        [[50, 1275]]
    # and a slow-threshold config flips the same write to effects
    db.config.effects_threshold_us = 0
    q(p, "CREATE (:B {v: 51})")
    assert q(r, "MATCH (b:B) RETURN count(*)").result_set == [[51]]


def test_replica_core_consumer_mixed_strategies():
    db = FalkorDB()
    p = db._get_or_create("mx1")
    r = db._get_or_create("mx2")
    p.add_replica(r)
    db.config.effects_threshold_us = 10**12
    q(p, "CREATE (:A {v: 1})")            # verbatim
    q(p, "CREATE (:A {v: rand()})")        # effects (nondet)
    db.config.effects_threshold_us = 0
    q(p, "MATCH (a:A {v: 1}) SET a.v = 2")  # effects (threshold)
    assert q(p, "MATCH (a:A) RETURN count(*)").result_set == \
        q(r, "MATCH (a:A) RETURN count(*)").result_set
    assert q(r, "MATCH (a:A {v: 2}) RETURN count(*)").result_set == [[1]]


def test_aof_crash_recovery(tmp_path):
    """Recovery = checkpoint + write-log suffix replay (RDB+AOF role)."""
    aof = str(tmp_path / "aof")
    ckpt = str(tmp_path / "ckpt")
    db = FalkorDB(aof_dir=aof)
    g = db.select_graph("wal")
    g.query("UNWIND range(1, 10) AS i CREATE (:N {v: i})")
    db.save(ckpt)  # checkpoint truncates the log
    g.query("CREATE (:N {v: 11})")           # suffix: effects or verbatim
    g.query("CREATE (:N {v: rand()})")        # suffix: forced effects
    # simulate crash: no save; recover from checkpoint + log
    db2 = FalkorDB.load(ckpt, aof_dir=aof)
    g2 = db2.select_graph("wal")
    assert g2.query("MATCH (n:N) RETURN count(*)").result_set == [[12]]
    # the nondeterministic value recovered exactly (effects, not re-rolled)
    v1 = g.query("MATCH (n:N) WHERE n.v < 1 RETURN n.v").result_set
    v2 = g2.query("MATCH (n:N) WHERE n.v < 1 RETURN n.v").result_set
    assert v1 == v2
    # post-recovery writes keep appending; a second recovery still works
    g2.query("CREATE (:N {v: 12})")
    db3 = FalkorDB.load(ckpt, aof_dir=aof)
    assert db3.select_graph("wal").query(
        "MATCH (n:N) RETURN count(*)").result_set == [[13]]


def test_aof_crc_and_versioning(tmp_path):
    """AOF v2 durability: codec-encoded QUERY records (no pickle),
    per-record CRC32, corrupt-record and torn-tail tolerance, and
    rejection of logs written by a newer format version."""
    import struct
    from falkordb_tpu.persist.aof import (AOF_MAGIC, EffectsLog, K_QUERY,
                                          _decode_query)

    path = str(tmp_path / "g.aof")
    log = EffectsLog(path)
    log.append_query("CREATE (:N {v: $v})", {"v": 7})
    log.append_query("CREATE (:N {v: $v})", {"v": [1, "x", None, 2.5]})
    log.append_effects(b"\x44\x47\x50\x46" + b"\x00" * 8)
    log.close()

    raw = open(path, "rb").read()
    assert b"pickle" not in raw
    recs = list(EffectsLog.records(path))
    assert len(recs) == 3
    kind, payload = recs[0]
    assert kind == K_QUERY
    text, params = _decode_query(payload)
    assert text == "CREATE (:N {v: $v})" and params == {"v": 7}
    assert _decode_query(recs[1][1])[1] == {"v": [1, "x", None, 2.5]}

    # flip one payload byte of record 2 -> CRC fails; records 0-1 survive
    corrupt = bytearray(raw)
    corrupt[-3] ^= 0xFF
    open(path, "wb").write(bytes(corrupt))
    assert len(list(EffectsLog.records(path))) == 2

    # torn tail: truncate mid-record
    open(path, "wb").write(raw[:-5])
    assert len(list(EffectsLog.records(path))) == 2

    # newer version header is rejected, not silently misparsed
    open(path, "wb").write(struct.pack("<IH", AOF_MAGIC, 99) + raw[6:])
    with pytest.raises(ValueError, match="newer"):
        list(EffectsLog.records(path))


def test_aof_recovery_after_simulated_version_change(tmp_path):
    """A v1-era log (legacy framing): effects records recover; pickled
    QUERY records are never silently dropped — unmigrated replay raises,
    and migrate_v1 upgrades the whole log to v2 (r4 contract)."""
    import pickle
    import struct

    import pytest

    from falkordb_tpu.persist.aof import EffectsLog, K_EFFECTS, K_QUERY
    from falkordb_tpu.persist.effects import OP_CREATE_NODE

    blob = encode_effects([(OP_CREATE_NODE, 0, ["N"], {"v": 1})])

    path = str(tmp_path / "old.aof")
    with open(path, "wb") as f:  # v1: no header, no CRC
        f.write(struct.pack("<IB", len(blob), K_EFFECTS) + blob)
        legacy = pickle.dumps(("CREATE (:X)", None))
        f.write(struct.pack("<IB", len(legacy), K_QUERY) + legacy)
    with pytest.raises(ValueError, match="migrate_v1"):
        list(EffectsLog.records(path))
    assert EffectsLog.migrate_v1(path) == 2
    recs = list(EffectsLog.records(path))
    assert [k for k, _ in recs] == [K_EFFECTS, K_QUERY]
