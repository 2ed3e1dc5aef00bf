"""Range index — sorted column arrays.

The reference targets a COW B⁺-tree (index/falkordb/cow_btree) over
RediSearch NUMERIC fields.  Device-side ordered search on TPU wants sorted
dense arrays + binary search (vectorizable, no pointers): this is the
sorted-array incarnation, rebuilt on commit (MVCC snapshots make in-place
balancing unnecessary)."""

from __future__ import annotations

import numpy as np

from falkordb_tpu.graph.attrstore import ABSENT


class RangeIndex:
    def __init__(self, num_vals, num_ids, str_vals, str_ids):
        self.num_vals = num_vals  # sorted float64
        self.num_ids = num_ids
        self.str_vals = str_vals  # sorted strings (object array)
        self.str_ids = str_ids

    @staticmethod
    def build(store, d) -> "RangeIndex":
        prop = d.props[0]
        aid = store.schema.attr_id(prop)
        lid = (store.schema.label_id(d.label) if d.entity == "node"
               else store.schema.reltype_id(d.label))
        nums, nids, strs, sids = [], [], [], []
        if aid is not None and lid is not None:
            attrs = store.node_attrs if d.entity == "node" else store.edge_attrs
            col = attrs.columns.get(aid)
            if col is not None:
                if d.entity == "node":
                    mask = store.label_masks.get(lid)
                    ids = np.nonzero(mask[: store.node_max])[0] if mask is not None else []
                else:
                    live = ~store.e_deleted[: store.edge_max]
                    ids = np.nonzero(
                        (store.e_type[: store.edge_max] == lid) & live)[0]
                for i in ids:
                    v = col.data[i]
                    if v is ABSENT or v is None:
                        continue
                    if isinstance(v, bool):
                        continue
                    if isinstance(v, (int, float)):
                        nums.append(float(v))
                        nids.append(int(i))
                    elif isinstance(v, str):
                        strs.append(v)
                        sids.append(int(i))
        order = np.argsort(nums, kind="stable") if nums else []
        sorder = np.argsort(strs, kind="stable") if strs else []
        return RangeIndex(
            np.asarray(nums, dtype=np.float64)[order] if nums else np.zeros(0),
            np.asarray(nids, dtype=np.int64)[order] if nums else np.zeros(0, np.int64),
            np.asarray(strs, dtype=object)[sorder] if strs else np.zeros(0, object),
            np.asarray(sids, dtype=np.int64)[sorder] if strs else np.zeros(0, np.int64),
        )

    def range_numeric(self, lo=-np.inf, hi=np.inf, lo_inc=True, hi_inc=True):
        l = np.searchsorted(self.num_vals, lo, side="left" if lo_inc else "right")
        r = np.searchsorted(self.num_vals, hi, side="right" if hi_inc else "left")
        return self.num_ids[l:r]

    def range_string(self, lo=None, hi=None, lo_inc=True, hi_inc=True):
        vals = self.str_vals
        l = 0 if lo is None else np.searchsorted(vals, lo, side="left" if lo_inc else "right")
        r = len(vals) if hi is None else np.searchsorted(vals, hi, side="right" if hi_inc else "left")
        return self.str_ids[l:r]

    def equals(self, v):
        if isinstance(v, str):
            return self.range_string(v, v)
        return self.range_numeric(float(v), float(v))
