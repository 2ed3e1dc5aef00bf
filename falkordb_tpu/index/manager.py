"""Index manager: DDL application + maintenance (reference:
graph/src/index/indexer.rs — here synchronous; background population comes
with the worker-pool subsystem)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class IndexDef:
    kind: str  # 'range' | 'fulltext' | 'vector'
    entity: str  # 'node' | 'edge'
    label: str
    props: tuple
    options: dict = field(default_factory=dict)
    impl: object = None

    @property
    def key(self):
        return (self.kind, self.entity, self.label, self.props)


def apply_ddl(core, kind: str, clause, rt):
    if kind == "create_index":
        props = tuple(clause.props)
        d = IndexDef(clause.kind, clause.entity, clause.label, props)
        if d.key in core.indexes:
            if clause.if_not_exists:
                return
            raise ValueError(
                f"index on {clause.label}({', '.join(props)}) already exists")
        if clause.options is not None:
            from falkordb_tpu.runtime.eval import evaluate
            from falkordb_tpu.runtime.batch import Batch

            opts = rt.ctx.materialize(
                evaluate(clause.options, Batch.unit(), rt.ctx))[0]
            if isinstance(opts, dict):
                d.options = opts
        core.indexes[d.key] = d
        rt.stats["indices_created"] += 1
        _build(core, d)
    elif kind == "drop_index":
        props = tuple(clause.props)
        for k in list(core.indexes):
            if k[1:] == (clause.entity, clause.label, props):
                del core.indexes[k]
                rt.stats["indices_deleted"] += 1
                return
        raise ValueError("no such index")


def build_index(store, d: IndexDef):
    if d.kind == "range":
        from falkordb_tpu.index.range_index import RangeIndex

        d.impl = RangeIndex.build(store, d)
    elif d.kind == "vector":
        from falkordb_tpu.index.vector_index import VectorIndex

        d.impl = VectorIndex.build(store, d)
    elif d.kind == "fulltext":
        from falkordb_tpu.index.fulltext import FulltextIndex

        d.impl = FulltextIndex.build(store, d)


def _build(core, d: IndexDef):
    build_index(core.store, d)


def refresh_indexes(core):
    """Rebuild indexes after a write commit (synchronous for now; the
    reference populates in 10K batches in background, graph.rs:337-420)."""
    for d in core.indexes.values():
        build_index(core.store, d)
