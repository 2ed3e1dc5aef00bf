"""Mini openCypher-TCK harness (reference: tests/tck/test_tck.py drives the
public TCK via behave; this is a dependency-free Gherkin subset runner).

Parses .feature files (Scenario / Scenario Outline / Background / tags /
docstrings / tables), the TCK value notation in expected-result tables
(nodes, relationships, paths, lists, maps, literals), runs each scenario
against an embedded graph, and checks rows + side effects.

The feature files themselves are NOT vendored: point TCK_FEATURES at a
checkout of the openCypher TCK (defaults to the reference's copy when
present).  tests/tck_passlist.txt is the ratchet: every scenario listed
there must keep passing.
"""

from __future__ import annotations

import os
import re

TCK_FEATURES_DEFAULT = "/root/reference/tests/tck/features"

# TCK-standard binary-tree fixture graphs (openCypher TCK `Given the
# binary-tree-N graph` steps).
BINARY_TREE_1 = """
CREATE (a:A {name:'a'}), (b1:X {name:'b1'}), (b2:X {name:'b2'}),
       (b3:X {name:'b3'}), (b4:X {name:'b4'}), (c11:X {name:'c11'}),
       (c12:X {name:'c12'}), (c21:X {name:'c21'}), (c22:X {name:'c22'}),
       (c31:X {name:'c31'}), (c32:X {name:'c32'}), (c41:X {name:'c41'}),
       (c42:X {name:'c42'})
CREATE (a)-[:KNOWS]->(b1), (a)-[:KNOWS]->(b2), (a)-[:FOLLOWS]->(b3),
       (a)-[:FOLLOWS]->(b4)
CREATE (b1)-[:FRIEND]->(c11), (b1)-[:FRIEND]->(c12),
       (b2)-[:FRIEND]->(c21), (b2)-[:FRIEND]->(c22),
       (b3)-[:FRIEND]->(c31), (b3)-[:FRIEND]->(c32),
       (b4)-[:FRIEND]->(c41), (b4)-[:FRIEND]->(c42)
CREATE (b1)-[:FRIEND]->(b2), (b2)-[:FRIEND]->(b3), (b3)-[:FRIEND]->(b4),
       (b4)-[:FRIEND]->(b1)
"""
BINARY_TREE_2 = BINARY_TREE_1.replace("c12:X", "c12:Y").replace(
    "c22:X", "c22:Y").replace("c32:X", "c32:Y").replace("c42:X", "c42:Y")

SIDE_EFFECT_KEYS = {
    "+nodes": "nodes_created", "-nodes": "nodes_deleted",
    "+relationships": "relationships_created",
    "-relationships": "relationships_deleted",
    "+properties": "properties_set", "-properties": "properties_removed",
    "+labels": "labels_added", "-labels": "labels_removed",
}


# --------------------------------------------------------------- gherkin


class Step:
    def __init__(self, kind, text):
        self.kind = kind          # given|when|then|and (resolved to owner)
        self.text = text
        self.doc = None
        self.table = None

    def __repr__(self):
        return f"<{self.kind} {self.text!r}>"


class Scenario:
    def __init__(self, name, tags, steps, sid):
        self.name = name
        self.tags = tags
        self.steps = steps
        self.sid = sid            # stable id: relpath::name[#example-i]


def _split_table_row(line):
    # cells between pipes; at the GHERKIN level '\|' escapes a pipe and
    # '\\' escapes the backslash itself (Literals6 [5] documents this:
    # "\\\\ for \\"); other escapes (\n etc.) pass through for the
    # expected-value parser
    out, cur, i = [], [], 0
    s = line.strip()
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt in ("\\", "|"):
                cur.append(nxt)
                i += 2
                continue
            cur.append(c)
            i += 1
            continue
        if c == "|":
            out.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    out.append("".join(cur).strip())
    return out[1:-1]


def parse_feature(text, relpath=""):
    lines = text.splitlines()
    i = 0
    scenarios = []
    background: list[Step] = []
    pending_tags: list[str] = []
    feature_tags: list[str] = []
    cur = None            # (name, tags, steps, is_outline)
    outline_examples = None

    def flush():
        nonlocal cur, outline_examples
        if cur is None:
            return
        name, tags, steps, is_outline = cur
        if not is_outline:
            scenarios.append(Scenario(
                name, tags, background + steps, f"{relpath}::{name}"))
        elif outline_examples:
            header, rows = outline_examples
            for ri, row in enumerate(rows):
                sub = dict(zip(header, row))

                def subst(s):
                    for k, v in sub.items():
                        s = s.replace(f"<{k}>", v)
                    return s

                esteps = []
                for st in steps:
                    ns = Step(st.kind, subst(st.text))
                    ns.doc = subst(st.doc) if st.doc is not None else None
                    ns.table = ([[subst(c) for c in r] for r in st.table]
                                if st.table is not None else None)
                    esteps.append(ns)
                scenarios.append(Scenario(
                    f"{name}#{ri + 1}", tags, background + esteps,
                    f"{relpath}::{name}#{ri + 1}"))
        cur = None
        outline_examples = None

    in_background = False
    last_step = None
    while i < len(lines):
        line = lines[i]
        s = line.strip()
        if not s or s.startswith("#"):
            i += 1
            continue
        if s.startswith("@"):
            pending_tags = s.split()
            i += 1
            continue
        if s.startswith("Feature:"):
            feature_tags = pending_tags
            pending_tags = []
            i += 1
            continue
        if s.startswith("Background:"):
            flush()
            in_background = True
            pending_tags = []
            i += 1
            continue
        m = re.match(r"Scenario(?: Outline)?:\s*(.*)", s)
        if m:
            flush()
            in_background = False
            cur = (m.group(1).strip(), feature_tags + pending_tags, [],
                   s.startswith("Scenario Outline"))
            pending_tags = []
            i += 1
            continue
        if s.startswith("Examples:"):
            rows = []
            i += 1
            while i < len(lines) and lines[i].strip().startswith("|"):
                rows.append(_split_table_row(lines[i]))
                i += 1
            if rows:
                outline_examples = (rows[0], rows[1:])
            continue
        m = re.match(r"(Given|When|Then|And|But)\s+(.*)", s)
        if m:
            kind = m.group(1).lower()
            if kind in ("and", "but") and last_step is not None:
                kind = last_step.kind
            st = Step(kind, m.group(2).strip())
            # attached docstring / table
            j = i + 1
            while j < len(lines) and not lines[j].strip():
                j += 1
            if j < len(lines) and lines[j].strip() in ('"""', "'''"):
                quote = lines[j].strip()
                j += 1
                doc = []
                while j < len(lines) and lines[j].strip() != quote:
                    doc.append(lines[j])
                    j += 1
                st.doc = "\n".join(doc)
                i = j + 1
            elif j < len(lines) and lines[j].strip().startswith("|"):
                tbl = []
                while j < len(lines) and lines[j].strip().startswith("|"):
                    tbl.append(_split_table_row(lines[j]))
                    j += 1
                st.table = tbl
                i = j
            else:
                i += 1
            if cur is not None or in_background:
                (background if in_background else cur[2]).append(st)
            last_step = st
            continue
        i += 1
    flush()
    return scenarios


# ------------------------------------------------- TCK value notation


class _P:
    def __init__(self, s):
        self.s = s
        self.i = 0

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else ""

    def eat(self, c):
        if not self.s.startswith(c, self.i):
            raise ValueError(f"expected {c!r} at {self.s[self.i:]!r}")
        self.i += len(c)

    def value(self):
        self.ws()
        c = self.peek()
        if c == "'":
            return self.string()
        if c == "[":
            # relationship or list
            save = self.i
            try:
                return self.rel()
            except ValueError:
                self.i = save
                return self.list_()
        if c == "{":
            return self.map_()
        if c == "(":
            return self.node()
        if c == "<":
            return self.path()
        m = re.match(r"-?\d+\.\d+(?:[eE][+-]?\d+)?|-?\d+[eE][+-]?\d+",
                     self.s[self.i:])
        if m:
            self.i += m.end()
            return ("f", float(f"{float(m.group(0)):.12g}"))
        m = re.match(r"-?\d+", self.s[self.i:])
        if m:
            self.i += m.end()
            return ("i", int(m.group(0)))
        for lit, v in (("true", ("b", True)), ("false", ("b", False)),
                       ("null", ("null",)), ("NaN", ("f", float("nan")))):
            if self.s.startswith(lit, self.i):
                self.i += len(lit)
                return v
        raise ValueError(f"bad value at {self.s[self.i:]!r}")

    def string(self):
        self.eat("'")
        out = []
        while True:
            c = self.peek()
            if c == "":
                raise ValueError("unterminated string")
            if c == "\\":
                # expected-value strings use Cypher escapes ('\n' in the
                # table cell means a newline — TCK String8/9/10 [5])
                nxt = self.s[self.i + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r",
                            "f": "\f", "b": "\b"}.get(nxt, nxt))
                self.i += 2
                continue
            if c == "'":
                self.i += 1
                return ("s", "".join(out))
            out.append(c)
            self.i += 1

    def list_(self):
        self.eat("[")
        items = []
        self.ws()
        if self.peek() == "]":
            self.i += 1
            return ("l", tuple(items))
        while True:
            items.append(self.value())
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.eat("]")
            return ("l", tuple(items))

    def map_(self):
        self.eat("{")
        items = []
        self.ws()
        if self.peek() == "}":
            self.i += 1
            return ("m", tuple(items))
        while True:
            self.ws()
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", self.s[self.i:])
            if m is None:
                raise ValueError("bad map key")
            k = m.group(0)
            self.i += m.end()
            self.ws()
            self.eat(":")
            v = self.value()
            items.append((k, v))
            self.ws()
            if self.peek() == ",":
                self.i += 1
                continue
            self.eat("}")
            return ("m", tuple(sorted(items)))

    def node(self):
        self.eat("(")
        labels = []
        self.ws()
        while self.peek() == ":":
            self.i += 1
            m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", self.s[self.i:])
            labels.append(m.group(0))
            self.i += m.end()
            self.ws()
        props = ("m", ())
        if self.peek() == "{":
            props = self.map_()
        self.ws()
        self.eat(")")
        return ("node", frozenset(labels), props)

    def rel(self):
        self.eat("[")
        self.ws()
        self.eat(":")
        m = re.match(r"[A-Za-z_][A-Za-z0-9_]*", self.s[self.i:])
        if m is None:
            raise ValueError("bad rel type")
        typ = m.group(0)
        self.i += m.end()
        self.ws()
        props = ("m", ())
        if self.peek() == "{":
            props = self.map_()
        self.ws()
        self.eat("]")
        return ("rel", typ, props)

    def path(self):
        self.eat("<")
        elems = [self.node()]
        while True:
            self.ws()
            if self.peek() == ">":
                self.i += 1
                return ("path", tuple(elems))
            if self.s.startswith("<-", self.i):
                self.i += 2
                r = self.rel()
                self.eat("-")
                n = self.node()
                elems.append((False, r))
                elems.append(n)
            elif self.peek() == "-":
                self.i += 1
                r = self.rel()
                self.eat("->")
                n = self.node()
                elems.append((True, r))
                elems.append(n)
            else:
                raise ValueError(f"bad path at {self.s[self.i:]!r}")


def parse_tck_value(cell):
    p = _P(cell.strip())
    v = p.value()
    p.ws()
    if p.i != len(p.s):
        raise ValueError(f"trailing input in {cell!r}")
    return v


# ------------------------------------------------------- canonicalize


def canon(v, sort_lists=False):
    """Engine value → comparable tagged tuple (same space as
    parse_tck_value output)."""
    from falkordb_tpu.runtime.value import EdgeVal, NodeVal, PathVal

    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", float(f"{v:.12g}"))
    if isinstance(v, str):
        return ("s", v)
    if isinstance(v, NodeVal):
        return ("node", frozenset(v.labels),
                ("m", tuple(sorted((k, canon(x, sort_lists))
                                   for k, x in v.properties.items()))))
    if isinstance(v, EdgeVal):
        return ("rel", v.relation,
                ("m", tuple(sorted((k, canon(x, sort_lists))
                                   for k, x in v.properties.items()))))
    if isinstance(v, PathVal):
        elems = [canon(v.nodes[0], sort_lists)]
        for i, e in enumerate(v.edges):
            fwd = e.src_node == v.nodes[i].id
            if e.src_node == e.dst_node:
                fwd = True
            elems.append((fwd, canon(e, sort_lists)))
            elems.append(canon(v.nodes[i + 1], sort_lists))
        return ("path", tuple(elems))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, canon(x, sort_lists))
                                  for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        items = [canon(x, sort_lists) for x in v]
        if sort_lists:
            items = sorted(items, key=repr)
        return ("l", tuple(items))
    return ("?", repr(v))


def _sort_expected_lists(v):
    if not isinstance(v, tuple) or not v:
        return v
    if v[0] == "l":
        return ("l", tuple(sorted((_sort_expected_lists(x) for x in v[1]),
                                  key=repr)))
    if v[0] == "m":
        return ("m", tuple(sorted((k, _sort_expected_lists(x))
                                  for k, x in v[1])))
    if v[0] in ("node", "rel"):
        return v[:-1] + (_sort_expected_lists(v[-1]),)
    if v[0] == "path":
        out = []
        for e in v[1]:
            if isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], bool):
                out.append((e[0], _sort_expected_lists(e[1])))
            else:
                out.append(_sort_expected_lists(e))
        return ("path", tuple(out))
    return v


# ------------------------------------------------------------ executor


class ScenarioResult:
    def __init__(self, ok, reason=""):
        self.ok = ok
        self.reason = reason


def _params_to_python(v):
    """Parsed TCK value → plain python for query params."""
    tag = v[0]
    if tag == "null":
        return None
    if tag in ("b", "i", "f", "s"):
        return v[1]
    if tag == "l":
        return [_params_to_python(x) for x in v[1]]
    if tag == "m":
        return {k: _params_to_python(x) for k, x in v[1]}
    raise ValueError(f"unsupported param value {v!r}")


def run_scenario(db, scenario, graph_name="tck_g"):
    try:
        db.select_graph(graph_name).delete()
    except Exception:
        pass
    g = db.select_graph(graph_name)
    params = None
    result = None
    error = None
    error_expected = False
    stats = {}

    def rows_check(step, any_order, sort_lists=False):
        if result is None:
            return f"no result before assertion (error: {error})"
        header = [c for c in step.table[0]]
        if list(result.header) != header:
            return f"header {result.header} != {header}"
        try:
            expected = [[parse_tck_value(c) for c in r]
                        for r in step.table[1:]]
        except ValueError as e:
            return f"unparseable expected value: {e}"
        if sort_lists:
            expected = [[_sort_expected_lists(v) for v in r]
                        for r in expected]
        actual = [[canon(v, sort_lists) for v in row]
                  for row in result.result_set]
        if any_order or sort_lists:
            a = sorted(actual, key=repr)
            b = sorted(expected, key=repr)
        else:
            a, b = actual, expected
        if a != b:
            return (f"rows mismatch:\n  actual   {actual!r}\n"
                    f"  expected {expected!r}")
        return None

    for step in scenario.steps:
        t = step.text
        try:
            if t.startswith("having executed"):
                # setup steps appear with a bare leading "And" (inheriting
                # whatever kind the previous scenario ended on) — always
                # treat them as setup (Match5 [25]-[29])
                g.query(step.doc)
                continue
            if step.kind == "given":
                if "binary-tree-1" in t:
                    g.query(BINARY_TREE_1)
                elif "binary-tree-2" in t:
                    g.query(BINARY_TREE_2)
                elif "empty graph" in t or "any graph" in t:
                    pass
                elif t.startswith("having executed"):
                    g.query(step.doc)
                elif t.startswith("parameters are"):
                    params = {r[0]: _params_to_python(parse_tck_value(r[1]))
                              for r in step.table}
                else:
                    return ScenarioResult(False, f"unsupported given: {t}")
            elif step.kind == "when":
                if not t.startswith("executing"):
                    return ScenarioResult(False, f"unsupported when: {t}")
                is_control = "control query" in t
                result, error = None, None
                try:
                    result = g.query(step.doc, params=params)
                    if not is_control:
                        stats = result.stats
                except Exception as e:  # expected-error scenarios
                    error = e
            elif step.kind == "then":
                if "should be raised" in t:
                    error_expected = True
                    if error is None:
                        return ScenarioResult(
                            False, f"expected error, got result "
                                   f"{getattr(result, 'result_set', None)!r}")
                elif t.startswith("the result should be empty"):
                    if error is not None:
                        return ScenarioResult(False, f"query error: {error}")
                    if result.result_set != []:
                        return ScenarioResult(
                            False, f"expected empty, got {result.result_set}")
                elif "no side effects" in t:
                    for k, attr in SIDE_EFFECT_KEYS.items():
                        if stats.get(attr, 0):
                            return ScenarioResult(
                                False, f"unexpected side effect {k}="
                                       f"{stats.get(attr)}")
                elif "side effects should be" in t:
                    want = {r[0]: int(r[1]) for r in step.table}
                    for k, attr in SIDE_EFFECT_KEYS.items():
                        if k == "-labels":
                            # the TCK's `-labels` semantics are internally
                            # inconsistent (Delete1 [3] deletes the last :X
                            # node with no -labels effect; Delete5 [3]
                            # expects -labels 1 for the same shape) — the
                            # reference skips this assertion too
                            # (/root/reference/tests/tck/falkor_utils/
                            # assertions.py:137-139)
                            continue
                        if stats.get(attr, 0) != want.get(k, 0):
                            return ScenarioResult(
                                False, f"side effect {k}: "
                                       f"{stats.get(attr, 0)} != "
                                       f"{want.get(k, 0)}")
                elif "result should be" in t:
                    if error is not None and not error_expected:
                        return ScenarioResult(False, f"query error: {error}")
                    any_order = "in any order" in t
                    ignore_list_order = "ignoring element order" in t
                    bad = rows_check(step, any_order or ignore_list_order,
                                     ignore_list_order)
                    if bad:
                        return ScenarioResult(False, bad)
                else:
                    return ScenarioResult(False, f"unsupported then: {t}")
        except Exception as e:
            return ScenarioResult(False,
                                  f"harness error on {step!r}: {e!r}")
    if error is not None and not error_expected:
        return ScenarioResult(False, f"query error: {error}")
    return ScenarioResult(True)


def discover(features_dir):
    out = []
    for root, _dirs, files in sorted(os.walk(features_dir)):
        for f in sorted(files):
            if not f.endswith(".feature"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, features_dir)
            with open(path, encoding="utf-8") as fh:
                out.extend(parse_feature(fh.read(), rel))
    return out
