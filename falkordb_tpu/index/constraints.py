"""Constraints: UNIQUE and MANDATORY (reference: src/commands/constraint.rs +
graph/src/graph/constraint.rs).  Validation is synchronous (the reference
validates async with UnderConstruction status)."""

from __future__ import annotations

import numpy as np

from falkordb_tpu.graph.attrstore import ABSENT


class ConstraintViolation(ValueError):
    pass


def _entities_of(store, entity, label):
    if entity.lower() in ("node", "nodes"):
        lid = store.schema.label_id(label)
        if lid is None:
            return np.zeros(0, dtype=np.int64), "node"
        m = store.label_masks.get(lid)
        return (np.nonzero(m[: store.node_max])[0]
                if m is not None else np.zeros(0, np.int64)), "node"
    tid = store.schema.reltype_id(label)
    if tid is None:
        return np.zeros(0, dtype=np.int64), "edge"
    live = ~store.e_deleted[: store.edge_max]
    return np.nonzero((store.e_type[: store.edge_max] == tid) & live)[0], "edge"


def validate_constraint(store, c) -> None:
    ents, kind = _entities_of(store, c["entity"], c["label"])
    attrs = store.node_attrs if kind == "node" else store.edge_attrs
    aids = [store.schema.attr_id(p) for p in c["properties"]]
    if c["type"] == "mandatory":
        for e in ents:
            for aid in aids:
                if aid is None or attrs.get(int(e), aid) in (ABSENT, None):
                    raise ConstraintViolation(
                        f"mandatory constraint violation: {c['label']} "
                        f"missing {c['properties']}")
    else:  # unique
        seen = {}
        for e in ents:
            key = []
            missing = False
            for aid in aids:
                v = attrs.get(int(e), aid) if aid is not None else ABSENT
                if v is ABSENT:
                    missing = True
                    break
                key.append(v if not isinstance(v, list) else tuple(v))
            if missing:
                continue
            k = tuple(key)
            if k in seen:
                raise ConstraintViolation(
                    f"unique constraint violation on {c['label']}"
                    f"({', '.join(c['properties'])})")
            seen[k] = int(e)


def create_constraint(core, ctype, entity, label, properties):
    ctype = ctype.lower()
    if ctype not in ("unique", "mandatory"):
        raise ValueError("constraint type must be UNIQUE or MANDATORY")
    c = {"type": ctype, "entity": entity, "label": label,
         "properties": list(properties), "status": "UNDER_CONSTRUCTION"}
    for existing in core.constraints:
        if (existing["type"] == ctype and existing["label"] == label
                and existing["properties"] == c["properties"]
                and existing["entity"] == entity):
            raise ValueError("constraint already exists")
    validate_constraint(core.store, c)
    c["status"] = "OPERATIONAL"
    core.constraints.append(c)
    return c


def drop_constraint(core, ctype, entity, label, properties):
    ctype = ctype.lower()
    for i, c in enumerate(core.constraints):
        if (c["type"] == ctype and c["label"] == label
                and c["properties"] == list(properties)
                and c["entity"] == entity):
            del core.constraints[i]
            return True
    raise ValueError("no such constraint")


def enforce_after_write(core, store) -> None:
    """Called before commit; raises (aborting the write) on violation."""
    for c in core.constraints:
        if c["status"] == "OPERATIONAL":
            validate_constraint(store, c)
