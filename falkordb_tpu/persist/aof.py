"""Append-only write log (the reference's AOF role: effects buffers are
streamed to Redis' AOF via replicate-verbatim / effects, pending.rs:1629,
src/graph_core.rs:1465-1505).

Crash recovery = checkpoint + log replay: every committed write appends one
record — either the binary effects buffer (kind=EFFECTS) or the verbatim
query text+params (kind=QUERY, chosen by GraphCore._should_use_effects).
`FalkorDB.save` checkpoints and then truncates the log, so recovery replays
only the suffix since the last checkpoint.

Record wire layout: [u32 payload_len][u8 kind][payload].
"""

from __future__ import annotations

import os
import pickle
import struct
import threading

K_EFFECTS = 1
K_QUERY = 2


class EffectsLog:
    def __init__(self, path: str, fsync: bool = False):
        self.path = path
        self.fsync = fsync
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "ab")

    def _append(self, kind: int, payload: bytes) -> None:
        rec = struct.pack("<IB", len(payload), kind) + payload
        with self._lock:
            self._f.write(rec)
            self._f.flush()
            if self.fsync:
                os.fsync(self._f.fileno())

    def append_effects(self, blob: bytes) -> None:
        self._append(K_EFFECTS, blob)

    def append_query(self, text: str, params) -> None:
        self._append(K_QUERY, pickle.dumps((text, params)))

    def reset(self) -> None:
        """Truncate after a checkpoint: the log now only needs to cover
        writes since that snapshot."""
        with self._lock:
            self._f.close()
            self._f = open(self.path, "wb")

    def close(self) -> None:
        with self._lock:
            self._f.close()

    @staticmethod
    def records(path: str):
        """Iterate (kind, payload) records; tolerates a torn final record
        (partial write at crash)."""
        if not os.path.exists(path):
            return
        with open(path, "rb") as f:
            data = f.read()
        off = 0
        while off + 5 <= len(data):
            (ln, kind) = struct.unpack_from("<IB", data, off)
            if off + 5 + ln > len(data):
                break  # torn tail record — drop it
            yield kind, data[off + 5: off + 5 + ln]
            off += 5 + ln

    @staticmethod
    def replay(path: str, core) -> int:
        """Apply every record to `core`; returns the replay count."""
        n = 0
        for kind, payload in EffectsLog.records(path):
            if kind == K_EFFECTS:
                core.apply_effects_blob(payload)
            else:
                text, params = pickle.loads(payload)
                core.query(text, params=params)
            n += 1
        return n
