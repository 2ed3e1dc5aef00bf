"""Versioned UDF library store (reference: graph/src/udf/repository.rs).

Loading executes the library source once; functions register through
`falkor.register(name, fn)`.  The repository version bumps on every
mutation so plan caches can invalidate (graph.rs:1095 doc:63-68)."""

from __future__ import annotations

import builtins
import logging
import math
import threading

logger = logging.getLogger("falkordb_tpu.udf")


class UdfError(ValueError):
    pass


_SAFE_BUILTINS = {
    k: getattr(builtins, k)
    for k in (
        "abs", "all", "any", "bool", "dict", "enumerate", "filter", "float",
        "frozenset", "int", "len", "list", "map", "max", "min", "range",
        "repr", "reversed", "round", "set", "sorted", "str", "sum", "tuple",
        "zip", "isinstance", "ValueError", "TypeError", "Exception", "print",
    )
}


class _FalkorApi:
    """The `falkor` global visible to library code (udf/js_globals.rs)."""

    def __init__(self, lib: "UdfLibrary"):
        self._lib = lib

    def register(self, name: str, fn) -> None:
        if not callable(fn):
            raise UdfError(f"falkor.register({name!r}): not callable")
        self._lib.functions[name] = fn

    def log(self, *args) -> None:
        logger.info("[udf:%s] %s", self._lib.name,
                    " ".join(str(a) for a in args))


class UdfLibrary:
    def __init__(self, name: str, code: str):
        self.name = name
        self.code = code
        self.functions: dict[str, callable] = {}

    def load(self) -> None:
        ns = {"__builtins__": _SAFE_BUILTINS, "math": math,
              "falkor": _FalkorApi(self)}
        try:
            exec(compile(self.code, f"<udf:{self.name}>", "exec"), ns)
        except UdfError:
            raise
        except Exception as e:  # noqa: BLE001
            raise UdfError(f"error loading UDF library {self.name!r}: {e}")
        if not self.functions:
            raise UdfError(
                f"library {self.name!r} registered no functions")


class UdfRepository:
    def __init__(self):
        self.libs: dict[str, UdfLibrary] = {}
        self.version = 0
        self._lock = threading.Lock()

    def load(self, name: str, code: str, replace: bool = False) -> list[str]:
        with self._lock:
            if name in self.libs and not replace:
                raise UdfError(f"library {name!r} already exists")
            lib = UdfLibrary(name, code)
            lib.load()
            self.libs[name] = lib
            self.version += 1
            return sorted(lib.functions)

    def delete(self, name: str) -> None:
        with self._lock:
            if name not in self.libs:
                raise UdfError(f"library {name!r} does not exist")
            del self.libs[name]
            self.version += 1

    def flush(self) -> None:
        with self._lock:
            self.libs.clear()
            self.version += 1

    def list(self, lib: str | None = None, with_code: bool = False):
        out = []
        for name, l in sorted(self.libs.items()):
            if lib is not None and name != lib:
                continue
            entry = {"library_name": name, "functions": sorted(l.functions)}
            if with_code:
                entry["library_code"] = l.code
            out.append(entry)
        return out

    def lookup(self, dotted: str):
        """`Lib.fn` → callable or None.  Case-sensitive on both parts
        (matching the reference's JS semantics)."""
        if "." not in dotted:
            return None
        lib, fn = dotted.split(".", 1)
        l = self.libs.get(lib)
        if l is None:
            return None
        return l.functions.get(fn)
