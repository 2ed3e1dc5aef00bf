"""Threaded TCP server speaking RESP + the GRAPH.* command set.

Command surface mirrors the reference's 18 registered commands
(src/lib.rs:69-96): GRAPH.QUERY / RO_QUERY / EXPLAIN / PROFILE / DELETE /
COPY / LIST / MEMORY / CONFIG / CONSTRAINT / SLOWLOG / INFO, plus the
minimum redis-compat verbs clients send on connect (PING/HELLO/INFO/
CLIENT/SELECT/COMMAND/DBSIZE/FLUSHALL/TYPE/SHUTDOWN)."""

from __future__ import annotations

import socket
import socketserver
import threading
import time

from falkordb_tpu.api import FalkorDB
from falkordb_tpu.server import resp
from falkordb_tpu.server.executor import QueryExecutor
from falkordb_tpu.server.protocol import encode_result
from falkordb_tpu.server.resp import RespError, SimpleString


class GraphServer:
    def __init__(self, host="127.0.0.1", port=6379, db: FalkorDB | None = None):
        self.db = db or FalkorDB()
        self.host = host
        self.port = port
        self._server = None
        self._thread = None
        # worker pool: connection threads submit GRAPH.* work and block on
        # the ticket (the reference's THREAD_COUNT pool + blocked-client
        # dispatch, src/lib.rs); bounded by MAX_QUEUED_QUERIES
        self.executor = QueryExecutor(
            thread_count=self.db.config.thread_count,
            max_pending=self.db.config.max_queued_queries)

    # ---------------------------------------------------------------- control

    def start(self) -> "GraphServer":
        handler = self._make_handler()

        class _Srv(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = _Srv((self.host, self.port), handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self):
        if self._server:
            self._server.shutdown()
            self._server.server_close()
        self.executor.shutdown()

    # --------------------------------------------------------------- dispatch

    def _make_handler(server_self):
        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                reader = resp.Reader(self.rfile)
                while True:
                    try:
                        args = resp.parse_command(reader)
                    except (ConnectionError, OSError):
                        return
                    except RespError as e:
                        self.wfile.write(resp.encode(e))
                        continue
                    if not args:
                        continue
                    try:
                        reply = server_self.dispatch(args)
                    except Exception as e:  # noqa: BLE001
                        msg = str(e)
                        if not msg.startswith("ERR"):
                            msg = f"ERR {msg}"
                        reply = RespError(msg)
                    try:
                        self.wfile.write(resp.encode(reply))
                        self.wfile.flush()
                    except (ConnectionError, OSError, BrokenPipeError):
                        return
                    if args[0].upper() == "QUIT":
                        return

        return Handler

    def dispatch(self, args: list[str]):
        cmd = args[0].upper()
        rest = args[1:]
        if cmd == "PING":
            return SimpleString(rest[0]) if rest else SimpleString("PONG")
        if cmd in ("HELLO",):
            return ["server", "falkordb-tpu", "version", "0.1.0", "proto", 2,
                    "mode", "standalone", "modules", [["name", "graph",
                                                      "ver", 1]]]
        if cmd in ("SELECT", "CLIENT", "AUTH", "RESET", "QUIT", "FLUSHALL",
                   "FLUSHDB"):
            if cmd in ("FLUSHALL", "FLUSHDB"):
                for name in self.db.list_graphs():
                    self.db._delete(name)
            return SimpleString("OK")
        if cmd == "COMMAND":
            return []
        if cmd == "INFO":
            return ("# Server\r\nredis_version:7.4.0\r\n"
                    "falkordb_tpu_version:0.1.0\r\n")
        if cmd == "DBSIZE":
            return len(self.db.list_graphs())
        if cmd == "TYPE":
            return SimpleString(
                "graphdata" if rest and rest[0] in self.db._graphs else "none")
        if cmd == "KEYS":
            return self.db.list_graphs()
        if cmd == "DEL":
            n = 0
            for name in rest:
                if name in self.db._graphs:
                    self.db._delete(name)
                    n += 1
            return n
        if cmd == "XLEN":
            return len(self._telemetry_stream(rest[0]))
        if cmd == "XRANGE":
            # XRANGE telemetry{<graph>} - +  (the reference's telemetry
            # flusher XADDs per-query entries to this stream)
            entries = self._telemetry_stream(rest[0])
            out = []
            for i, e in enumerate(entries):
                fields = []
                for k, v in e.items():
                    fields += [k, str(v)]
                out.append([f"{int(e['received_at'] * 1000)}-{i}", fields])
            return out
        if cmd.startswith("GRAPH."):
            # off the connection thread, onto the worker pool (blocked-client
            # dispatch); reads proceed concurrently on MVCC snapshots
            return self.executor.submit(
                lambda: self._graph_cmd(cmd[6:], rest))
        raise RespError(f"ERR unknown command '{args[0]}'")

    def _telemetry_stream(self, key: str) -> list:
        if key.startswith("telemetry{") and key.endswith("}"):
            name = key[10:-1]
            if name in self.db._graphs:
                return self.db._graphs[name].telemetry
        return []

    def _graph_cmd(self, sub: str, rest: list[str]):
        db = self.db
        if sub == "LIST":
            return db.list_graphs()
        if sub == "CONFIG":
            return self._config_cmd(rest)
        if sub == "UDF":
            return self._udf_cmd(rest)
        if not rest:
            raise RespError("ERR wrong number of arguments")
        name = rest[0]
        if sub in ("QUERY", "RO_QUERY", "PROFILE"):
            if len(rest) < 2:
                raise RespError("ERR wrong number of arguments")
            query = rest[1]
            opts = [o.lower() for o in rest[2:]]
            compact = "--compact" in opts
            timeout = None
            if "timeout" in opts:
                try:
                    timeout = int(opts[opts.index("timeout") + 1])
                except (IndexError, ValueError):
                    raise RespError("ERR invalid timeout")
            core = db._get_or_create(name)
            if sub == "PROFILE":
                result = core.query(query, timeout=timeout, profile=True)
                return (result.profile or "").split("\n")
            result = core.query(query, timeout=timeout,
                                read_only=(sub == "RO_QUERY"))
            return encode_result(result, core, compact, result.cached)
        if sub == "EXPLAIN":
            core = db._get_or_create(name)
            return core.explain(rest[1]).split("\n")
        if sub == "DELETE":
            if name not in db._graphs:
                raise RespError("ERR Invalid graph operation on empty key")
            db._delete(name)
            return SimpleString("OK")
        if sub == "COPY":
            if len(rest) < 2:
                raise RespError("ERR wrong number of arguments")
            db._copy(name, rest[1])
            return SimpleString("OK")
        if sub == "MEMORY":
            # GRAPH.MEMORY USAGE <name>
            gname = rest[1] if name.upper() == "USAGE" and len(rest) > 1 else name
            core = db._get_or_create(gname)
            m = core.memory_usage()
            out = []
            for k, v in m.items():
                out.append(k)
                out.append(v)
            return out
        if sub == "SLOWLOG":
            core = db._get_or_create(name)
            if len(rest) > 1 and rest[1].upper() == "RESET":
                core.slowlog.reset()
                return SimpleString("OK")
            return [[f"{e['timestamp']:.0f}", e["command"], e["query"],
                     f"{e['took_ms']:.3f}"] for e in core.slowlog.entries()]
        if sub == "CONSTRAINT":
            return self._constraint_cmd(rest)
        if sub == "DUMP":
            from falkordb_tpu.persist.dump import dump_graph

            core = db._get_or_create(name)
            return dump_graph(core)
        if sub == "RESTORE":
            from falkordb_tpu.persist.dump import restore_graph

            if name in db._graphs:
                raise RespError("ERR graph already exists")
            core = db._get_or_create(name)
            restore_graph(core, rest[1].encode("utf-8",
                                               errors="surrogateescape"))
            return SimpleString("OK")
        if sub == "BULK":
            # Binary form (reference src/commands/bulk_insert.rs:480):
            #   GRAPH.BULK <name> [BEGIN] <node_count> <edge_count>
            #     <node_token_count> <rel_token_count> <BI_* token blobs...>
            # JSON form (2 args, compat): GRAPH.BULK <name> <json payload>
            if len(rest) >= 6 or (len(rest) >= 2 and rest[1] == "BEGIN"):
                return self._bulk_binary(name, rest[1:])
            import json as _json

            from falkordb_tpu.graph.bulk import bulk_insert

            payload = _json.loads(rest[1])
            core = db._get_or_create(name)
            out = bulk_insert(
                core,
                nodes=[(g["labels"], g["count"], g.get("props"))
                       if "count" in g else (g["labels"], g["dicts"])
                       for g in payload.get("nodes", [])],
                edges=[(e["type"], e["src"], e["dst"], e.get("props"))
                       for e in payload.get("edges", [])],
            )
            st = out["stats"]
            return [f"{st['nodes_created']} nodes created, "
                    f"{st['relationships_created']} relationships created"]
        if sub == "RECORD":
            core = db._get_or_create(name)
            trace = core.record(rest[1])
            return [["    " * t["depth"] + t["operator"],
                     str(t["records"])] for t in trace]
        if sub == "EFFECT":
            blob = rest[1].encode("utf-8", errors="surrogateescape")
            core = db._get_or_create(name)
            core.apply_effects_blob(blob)
            return SimpleString("OK")
        if sub == "DEBUG":
            # GRAPH.DEBUG AUX START|END — virtual-key encode/decode state
            # control (src/commands/debug.rs): START clears pending decode
            # state and materializes vkey chunks for every graph; END
            # finalizes pending restores and drops the staged chunks.
            if name.upper() != "AUX" or len(rest) < 2:
                raise RespError(f"ERR Unknown DEBUG subcommand: {name}")
            action = rest[1].upper()
            from falkordb_tpu.persist.dump import (dump_graph_vkeys,
                                                   restore_graph_vkeys)

            if action == "START":
                self._aux_state = {}
                for gname in db.list_graphs():
                    core = db._graphs[gname]
                    self._aux_state[gname] = dump_graph_vkeys(
                        core, db.config.vkey_max_entity_count)
                return 1
            if action == "END":
                for gname, chunks in getattr(self, "_aux_state", {}).items():
                    if gname not in db._graphs:
                        core = db._get_or_create(gname)
                        restore_graph_vkeys(core,
                                            [p for _, p in chunks])
                self._aux_state = {}
                return 0
            raise RespError(f"ERR Unknown AUX action: {rest[1]}")
        if sub == "INFO":
            core = db._get_or_create(name)
            running = [[q["query"], "write" if q["write"] else "read",
                        f"{q['received_at']:.0f}", q["stage"]]
                       for q in core.running_queries()]
            waiting = [["(queued)", "-", "-", "waiting"]
                       for _ in range(self.executor.pending())]
            return ["# Running queries", running, "# Waiting queries",
                    waiting]
        raise RespError(f"ERR unknown subcommand GRAPH.{sub}")

    def _bulk_binary(self, name: str, rest: list[str]):
        """Binary GRAPH.BULK: counts + BI_* typed token blobs (blobs arrive
        surrogateescape-decoded from the RESP layer)."""
        from falkordb_tpu.graph.bulk import bulk_insert_binary

        begin = False
        if rest and rest[0] == "BEGIN":
            begin = True
            rest = rest[1:]
        if len(rest) < 4:
            raise RespError("ERR wrong number of arguments")
        if begin and name in self.db._graphs:
            raise RespError(
                f"ERR Graph with name '{name}' cannot be created, as key "
                f"'{name}' already exists.")
        if not begin and name not in self.db._graphs:
            raise RespError("ERR Invalid graph operation on empty key")
        try:
            node_count = int(rest[0])
            edge_count = int(rest[1])
            ntok = int(rest[2])
            rtok = int(rest[3])
        except ValueError:
            raise RespError("ERR Error parsing bulk counts.")
        blobs = [b.encode("utf-8", errors="surrogateescape")
                 for b in rest[4:]]
        if len(blobs) != ntok + rtok:
            raise RespError(
                "ERR Bulk insert format error, token count mismatch.")
        core = self.db._get_or_create(name)
        try:
            bulk_insert_binary(core, blobs[:ntok], blobs[ntok:],
                               node_count, edge_count)
        except Exception:
            if begin:
                # a failed BEGIN batch must not leave the key behind
                # (bulk_insert.rs discard_created_graph)
                self.db._delete(name)
            raise
        return SimpleString(
            f"{node_count} nodes created, {edge_count} relations created")

    def _config_cmd(self, rest):
        if not rest:
            raise RespError("ERR wrong number of arguments")
        action = rest[0].upper()
        cfg = self.db.config
        mapping = {
            "CACHE_SIZE": "cache_size",
            "TIMEOUT_DEFAULT": "timeout_default_ms",
            "TIMEOUT_MAX": "timeout_max_ms",
            "RESULTSET_SIZE": "resultset_size",
            "QUERY_MEM_CAPACITY": "query_mem_capacity",
            "DELTA_MAX_PENDING_CHANGES": "delta_max_pending_changes",
            "NODE_CREATION_BUFFER": "node_creation_buffer",
            "EFFECTS_THRESHOLD": "effects_threshold_us",
            "VKEY_MAX_ENTITY_COUNT": "vkey_max_entity_count",
            "MAX_INFO_QUERIES": "max_info_queries",
            "MAX_QUEUED_QUERIES": "max_queued_queries",
            "DELAY_INDEXING": "delay_indexing",
            "THREAD_COUNT": "thread_count",
        }
        if action == "GET":
            key = rest[1].upper() if len(rest) > 1 else "*"
            if key == "*":
                return [[k, getattr(cfg, v)] for k, v in mapping.items()]
            if key not in mapping:
                raise RespError("ERR Unknown configuration parameter")
            return [key, getattr(cfg, mapping[key])]
        if action == "SET":
            if len(rest) < 3:
                raise RespError("ERR wrong number of arguments")
            key = rest[1].upper()
            if key not in mapping:
                raise RespError("ERR Unknown configuration parameter")
            setattr(cfg, mapping[key], int(rest[2]))
            return SimpleString("OK")
        raise RespError("ERR unknown GRAPH.CONFIG action")

    def _udf_cmd(self, rest):
        # GRAPH.UDF LOAD [REPLACE] <name> <code> | DELETE <name> | FLUSH |
        # LIST [LIB <name>] [WITHCODE]   (src/commands/udf.rs)
        action = rest[0].upper()
        db = self.db
        if action == "LOAD":
            args = rest[1:]
            replace = False
            if args and args[0].upper() == "REPLACE":
                replace = True
                args = args[1:]
            if len(args) < 2:
                raise RespError("ERR wrong number of arguments")
            fns = db.udf_load(args[0], args[1], replace=replace)
            return SimpleString("OK")
        if action == "DELETE":
            db.udf_delete(rest[1])
            return SimpleString("OK")
        if action == "FLUSH":
            db.udf_flush()
            return SimpleString("OK")
        if action == "LIST":
            args = [a.upper() for a in rest[1:]]
            lib = None
            if "LIB" in args:
                lib = rest[1 + args.index("LIB") + 1]
            with_code = "WITHCODE" in args
            out = []
            for entry in db.udf_list(lib, with_code):
                row = ["library_name", entry["library_name"],
                       "functions", entry["functions"]]
                if with_code:
                    row += ["library_code", entry["library_code"]]
                out.append(row)
            return out
        raise RespError("ERR unknown GRAPH.UDF action")

    def _constraint_cmd(self, rest):
        # GRAPH.CONSTRAINT CREATE <key> UNIQUE|MANDATORY NODE <label>
        #   PROPERTIES <count> <prop...>   (src/commands/constraint.rs)
        action = rest[0].upper()
        if action not in ("CREATE", "DROP"):
            raise RespError("ERR unknown GRAPH.CONSTRAINT action")
        if len(rest) < 7:
            raise RespError("ERR wrong number of arguments")
        key, ctype, entity, label = rest[1], rest[2], rest[3], rest[4]
        if rest[5].upper() != "PROPERTIES":
            raise RespError("ERR expected PROPERTIES")
        count = int(rest[6])
        props = rest[7 : 7 + count]
        core = self.db._get_or_create(key)
        entity_kind = "node" if entity.upper() == "NODE" else "edge"
        if action == "CREATE":
            core.create_constraint(ctype, entity_kind, label, props)
            return SimpleString("PENDING")
        core.drop_constraint(ctype, entity_kind, label, props)
        return SimpleString("OK")
