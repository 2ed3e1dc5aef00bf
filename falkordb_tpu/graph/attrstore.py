"""Columnar attribute store with copy-on-write columns.

The reference packs per-entity attribute sets into radix-directory blocks
(graph/src/graph/attribute_store.rs, doc:18-67).  The TPU-first redesign is
**column-oriented**: one column per attribute id, so

  * numeric predicate filters gather a single contiguous column onto the
    device (the vectorized.rs fast path becomes a real SIMD/VPU path),
  * index builds are column scans,
  * MVCC copy-on-write happens at column granularity (the block-COW idea,
    one level coarser).

Each column is a numpy object array (Cypher properties are dynamically
typed) plus a lazily-built numeric mirror (float64 + validity) for device
filtering.  Missing is represented by the sentinel `ABSENT` (not None:
Cypher NULL is a storable-adjacent concept we keep distinct from missing).
"""

from __future__ import annotations

import numpy as np

class _Absent:
    """Singleton 'no entry' sentinel; survives pickling with identity."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __reduce__(self):
        return (_Absent, ())

    def __repr__(self):
        return "<ABSENT>"


ABSENT = _Absent()  # property missing (GraphBLAS "no entry")


class Column:
    __slots__ = ("data", "_numeric", "_numeric_valid", "_version")

    def __init__(self, cap: int):
        self.data = np.full(cap, ABSENT, dtype=object)
        self._numeric = None
        self._numeric_valid = None
        self._version = 0

    def copy(self) -> "Column":
        c = Column.__new__(Column)
        c.data = self.data.copy()
        c._numeric = None
        c._numeric_valid = None
        c._version = self._version
        return c

    def grow(self, cap: int) -> None:
        if cap <= len(self.data):
            return
        nd = np.full(cap, ABSENT, dtype=object)
        nd[: len(self.data)] = self.data
        self.data = nd
        self._numeric = None

    def set(self, idx, value) -> None:
        self.data[idx] = value
        self._numeric = None
        self._version += 1

    def get(self, idx):
        return self.data[idx]

    def numeric_view(self):
        """(values_f64, valid_mask) mirror for device-side range filters.
        Non-numeric entries are invalid."""
        if self._numeric is None:
            n = len(self.data)
            vals = np.zeros(n, dtype=np.float64)
            valid = np.zeros(n, dtype=bool)
            for i, v in enumerate(self.data):
                if isinstance(v, (int, float, np.integer, np.floating)) and not isinstance(v, bool):
                    vals[i] = v
                    valid[i] = True
            self._numeric = vals
            self._numeric_valid = valid
        return self._numeric, self._numeric_valid

    def present_mask(self) -> np.ndarray:
        return np.fromiter((v is not ABSENT for v in self.data), dtype=bool,
                           count=len(self.data))


class AttributeStore:
    """attr_id → Column, with COW fork for MVCC snapshots."""

    def __init__(self, cap: int = 0):
        self.cap = cap
        self.columns: dict[int, Column] = {}
        self._owned: set[int] = set()  # columns private to this fork

    def fork(self) -> "AttributeStore":
        s = AttributeStore.__new__(AttributeStore)
        s.cap = self.cap
        s.columns = dict(self.columns)  # share column objects
        s._owned = set()
        return s

    def _own(self, attr_id: int) -> Column:
        col = self.columns.get(attr_id)
        if col is None:
            col = Column(self.cap)
            self.columns[attr_id] = col
            self._owned.add(attr_id)
        elif attr_id not in self._owned:
            col = col.copy()
            self.columns[attr_id] = col
            self._owned.add(attr_id)
        return col

    def grow(self, cap: int) -> None:
        if cap <= self.cap:
            return
        self.cap = cap
        for aid in list(self.columns):
            col = self._own(aid)
            col.grow(cap)

    def set(self, entity_id: int, attr_id: int, value) -> bool:
        """Returns True if this stored/changed a value; value ABSENT deletes."""
        col = self._own(attr_id)
        old = col.get(entity_id)
        if value is ABSENT and old is ABSENT:
            return False
        col.set(entity_id, value)
        return True

    def get(self, entity_id: int, attr_id: int):
        col = self.columns.get(attr_id)
        if col is None:
            return ABSENT
        return col.get(entity_id)

    def get_all(self, entity_id: int) -> dict[int, object]:
        out = {}
        for aid, col in self.columns.items():
            v = col.get(entity_id)
            if v is not ABSENT:
                out[aid] = v
        return out

    def clear_entity(self, entity_id: int) -> int:
        """Remove all attributes of an entity (on delete); returns count."""
        n = 0
        for aid, col in list(self.columns.items()):
            if col.get(entity_id) is not ABSENT:
                self._own(aid).set(entity_id, ABSENT)
                n += 1
        return n

    def memory_bytes(self) -> int:
        return sum(c.data.nbytes for c in self.columns.values())
