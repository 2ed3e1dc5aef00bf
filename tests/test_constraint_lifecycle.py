"""Async constraint lifecycle (reference constraint.rs: PENDING reply,
UnderConstruction -> Operational / deleted-on-violation)."""

import time

import pytest

from falkordb_tpu import FalkorDB
from falkordb_tpu.index.constraints import wait_all


def _core(db, name):
    return db._get_or_create(name)


def test_background_scan_flips_to_operational():
    db = FalkorDB()
    g = db.select_graph("cl1")
    g.query("UNWIND range(1, 50) AS i CREATE (:U {k: i})")
    c = _core(db, "cl1").create_constraint("unique", "node", "U", ["k"])
    assert c["status"] in ("UNDER_CONSTRUCTION", "OPERATIONAL")
    wait_all(_core(db, "cl1"))
    assert c["status"] == "OPERATIONAL"


def test_violating_existing_data_drops_constraint():
    db = FalkorDB()
    g = db.select_graph("cl2")
    g.query("CREATE (:U {k: 1}), (:U {k: 1})")
    core = _core(db, "cl2")
    c = core.create_constraint("unique", "node", "U", ["k"])
    wait_all(core)
    assert c["status"] == "FAILED"
    assert core.constraints == []  # failed constraints are removed
    g.query("CREATE (:U {k: 1})")  # and nothing is enforced


def test_pending_constraint_enforces_new_writes():
    db = FalkorDB()
    g = db.select_graph("cl3")
    g.query("CREATE (:U {k: 1})")
    core = _core(db, "cl3")
    core.create_constraint("unique", "node", "U", ["k"])
    # regardless of scan completion, a conflicting NEW write must abort
    with pytest.raises(Exception):
        g.query("CREATE (:U {k: 1})")
    wait_all(core)


def test_status_surfaces_in_procedure():
    db = FalkorDB()
    g = db.select_graph("cl4")
    g.query("CREATE (:U {k: 1})")
    core = _core(db, "cl4")
    core.create_constraint("unique", "node", "U", ["k"])
    wait_all(core)
    rows = g.query("CALL db.constraints() YIELD type, label, status "
                   "RETURN type, label, status").result_set
    assert rows == [["unique", "U", "OPERATIONAL"]]
