"""GRAPH.DUMP / GRAPH.RESTORE — single-graph binary payloads.

The reference restores dump payloads via GRAPH.RESTORE
(src/commands/restore.rs); here the payload is the checkpoint directory
format tar-packed in memory."""

from __future__ import annotations

import io
import os
import tarfile
import tempfile


def dump_graph(core) -> bytes:
    from falkordb_tpu.persist.checkpoint import save_graph

    with tempfile.TemporaryDirectory() as td:
        gdir = os.path.join(td, "g")
        save_graph(core, gdir)
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tar:
            for fn in sorted(os.listdir(gdir)):
                tar.add(os.path.join(gdir, fn), arcname=fn)
        return buf.getvalue()


def restore_graph(core, payload: bytes) -> None:
    from falkordb_tpu.persist.checkpoint import load_graph

    with tempfile.TemporaryDirectory() as td:
        buf = io.BytesIO(payload)
        with tarfile.open(fileobj=buf, mode="r:gz") as tar:
            tar.extractall(td, filter="data")
        load_graph(core, td)
