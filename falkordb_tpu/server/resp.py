"""RESP2 protocol encode/decode (Redis serialization protocol)."""

from __future__ import annotations

import io


class RespError(Exception):
    """Carries a protocol-level -ERR reply."""


class SimpleString(str):
    """Marker for +OK style replies."""


def encode(value) -> bytes:
    """Python value → RESP2 bytes.  int → :, SimpleString → +, str/bytes →
    $bulk, None → $-1, list/tuple → *array, Exception → -ERR."""
    out = io.BytesIO()
    _enc(out, value)
    return out.getvalue()


def _enc(out, v):
    if isinstance(v, SimpleString):
        out.write(b"+" + v.encode() + b"\r\n")
    elif isinstance(v, bool):
        out.write(b":" + (b"1" if v else b"0") + b"\r\n")
    elif isinstance(v, int):
        out.write(b":" + str(v).encode() + b"\r\n")
    elif isinstance(v, float):
        s = repr(v)
        out.write(b"$" + str(len(s)).encode() + b"\r\n" + s.encode() + b"\r\n")
    elif isinstance(v, str):
        # surrogateescape keeps binary payloads (GRAPH.DUMP) round-trippable
        b = v.encode("utf-8", errors="surrogateescape")
        out.write(b"$" + str(len(b)).encode() + b"\r\n" + b + b"\r\n")
    elif isinstance(v, bytes):
        out.write(b"$" + str(len(v)).encode() + b"\r\n" + v + b"\r\n")
    elif v is None:
        out.write(b"$-1\r\n")
    elif isinstance(v, (list, tuple)):
        out.write(b"*" + str(len(v)).encode() + b"\r\n")
        for x in v:
            _enc(out, x)
    elif isinstance(v, Exception):
        msg = str(v).replace("\r", " ").replace("\n", " ")
        out.write(b"-" + msg.encode() + b"\r\n")
    else:
        raise TypeError(f"cannot RESP-encode {type(v).__name__}")


class Reader:
    """Incremental RESP2 reader over a socket-like file object."""

    def __init__(self, sock_file):
        self.f = sock_file

    def _line(self) -> bytes:
        line = self.f.readline()
        if not line:
            raise ConnectionError("connection closed")
        if not line.endswith(b"\r\n"):
            raise RespError("protocol error: missing CRLF")
        return line[:-2]

    def read(self):
        line = self._line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return SimpleString(rest.decode())
        if t == b"-":
            raise RespError(rest.decode())
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            if n < 0:
                return None
            data = self.f.read(n + 2)
            if len(data) != n + 2:
                raise ConnectionError("short read")
            return data[:-2]
        if t == b"*":
            n = int(rest)
            if n < 0:
                return None
            return [self.read() for _ in range(n)]
        # inline command (telnet style)
        return (line.split() if line else [])


def parse_command(reader: Reader) -> list[str]:
    """Read one client command → list of strings."""
    v = reader.read()
    if isinstance(v, list):
        out = []
        for x in v:
            if isinstance(x, bytes):
                # surrogateescape keeps binary payloads (GRAPH.EFFECT)
                # round-trippable through str args
                out.append(x.decode("utf-8", errors="surrogateescape"))
            else:
                out.append(str(x))
        return out
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="surrogateescape").split()
    return [str(v)]
