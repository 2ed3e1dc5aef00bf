"""LDBC SNB SF0.1-class scale validation (VERDICT r3 directive #2).

Generates a deterministic synthetic SNB-shaped dataset at >=10^6 total
entities (~306K nodes / ~1.08M edges at the default LDBC_PERSONS=30000),
imports it through the GRAPH.BULK engine path (falkordb_tpu.graph.bulk —
the same code the binary GRAPH.BULK command dispatches to), builds
indexes, then runs the interactive-short-read query set with interleaved
delta updates, checking every answer against a numpy oracle over the
generating tables.

Reference counterpart: /root/reference/tests/test_ldbc.py (LOAD CSV of
SNB SF0.1/SF1 + interactive reads); BASELINE.md config 4 (SF1 parity
with interleaved delta updates).

    python bench_ldbc.py                  # full SF0.1-class run
    LDBC_PERSONS=8000 python bench_ldbc.py  # smaller
    LDBC_OUT=LDBC_r04.json python bench_ldbc.py

Prints one JSON line per measurement; every query line carries
"parity": true checked against the oracle (the run aborts on mismatch).
"""

import json
import os
import sys
import time

import numpy as np


def gen_dataset(P, rng):
    t = {}
    t["person_id"] = np.arange(1000, 1000 + P, dtype=np.int64)
    t["person_first"] = np.array([f"F{i % 200}" for i in range(P)])
    t["person_last"] = np.array([f"L{i % 350}" for i in range(P)])
    t["person_bday"] = np.array(
        [f"19{60 + i % 40:02d}-{1 + i % 12:02d}-02" for i in range(P)])
    # KNOWS: ~6P random undirected pairs, deduped, a<b
    a = rng.integers(0, P, 6 * P)
    b = rng.integers(0, P, 6 * P)
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    pair = np.unique(lo.astype(np.int64) * P + hi)
    t["knows_a"] = (pair // P).astype(np.int64)
    t["knows_b"] = (pair % P).astype(np.int64)
    t["knows_since"] = 2010 + (pair % 10).astype(np.int64)
    NP_, NC, NF, NT = 4 * P, 5 * P, max(P // 10, 4), 3000
    t["post_id"] = np.arange(5_000_000, 5_000_000 + NP_, dtype=np.int64)
    t["post_creator"] = rng.integers(0, P, NP_)
    t["post_date"] = np.array(
        [f"2012-{1 + i % 12:02d}-{1 + i % 28:02d}" for i in range(NP_)])
    t["post_forum"] = rng.integers(0, NF, NP_)
    t["post_tag"] = rng.integers(0, NT, NP_)
    t["cmt_id"] = np.arange(9_000_000, 9_000_000 + NC, dtype=np.int64)
    t["cmt_creator"] = rng.integers(0, P, NC)
    t["cmt_reply_of"] = rng.integers(0, NP_, NC)
    t["cmt_date"] = np.array(
        [f"2013-{1 + i % 12:02d}-{1 + i % 28:02d}" for i in range(NC)])
    t["forum_id"] = np.arange(100_000, 100_000 + NF, dtype=np.int64)
    t["forum_title"] = np.array([f"Wall{i}" for i in range(NF)])
    t["tag_id"] = np.arange(200_000, 200_000 + NT, dtype=np.int64)
    t["tag_name"] = np.array([f"tag{i}" for i in range(NT)])
    t["member_forum"] = rng.integers(0, NF, 8 * P)
    t["member_person"] = rng.integers(0, P, 8 * P)
    return t


def main():
    P = int(os.environ.get("LDBC_PERSONS", "30000"))
    out_path = os.environ.get("LDBC_OUT")
    reps = int(os.environ.get("LDBC_REPS", "3"))
    lines = []

    def emit(obj):
        s = json.dumps(obj)
        print(s, flush=True)
        lines.append(s)
        if out_path:
            with open(out_path, "w") as f:
                f.write("\n".join(lines) + "\n")

    # CPU run: this is a scale/parity validation, not a TPU timing bench
    # (the axon sitecustomize forces jax_platforms; override post-import)
    import jax
    jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(42)
    t0 = time.perf_counter()
    t = gen_dataset(P, rng)
    n_nodes = (len(t["person_id"]) + len(t["post_id"]) + len(t["cmt_id"])
               + len(t["forum_id"]) + len(t["tag_id"]))
    n_edges = (len(t["knows_a"]) + len(t["post_id"]) * 3  # creator/container/tag
               + len(t["cmt_id"]) * 2 + len(t["member_forum"]))
    emit({"metric": "ldbc_dataset", "persons": P, "nodes": n_nodes,
          "edges": n_edges, "entities": n_nodes + n_edges,
          "gen_s": round(time.perf_counter() - t0, 2)})
    assert n_nodes + n_edges >= 1_000_000 or P < 22000, \
        "SF0.1-class run must exceed 1M entities"

    from falkordb_tpu import FalkorDB

    g = FalkorDB().select_graph("ldbc_scale")

    t0 = time.perf_counter()
    out = g.bulk_insert(nodes=[
        (["Person"], P, {"id": t["person_id"].tolist(),
                         "firstName": t["person_first"].tolist(),
                         "lastName": t["person_last"].tolist(),
                         "birthday": t["person_bday"].tolist()}),
        (["Post"], len(t["post_id"]),
         {"id": t["post_id"].tolist(),
          "creationDate": t["post_date"].tolist()}),
        (["Comment"], len(t["cmt_id"]),
         {"id": t["cmt_id"].tolist(),
          "creationDate": t["cmt_date"].tolist()}),
        (["Forum"], len(t["forum_id"]),
         {"id": t["forum_id"].tolist(),
          "title": t["forum_title"].tolist()}),
        (["Tag"], len(t["tag_id"]), {"id": t["tag_id"].tolist(),
                                     "name": t["tag_name"].tolist()}),
    ])
    pid, poid, cid, fid, tid = out["node_ids"]
    g.bulk_insert(edges=[
        ("KNOWS", pid[t["knows_a"]], pid[t["knows_b"]],
         {"since": t["knows_since"].tolist()}),
        ("HAS_CREATOR", poid, pid[t["post_creator"]], None),
        ("CONTAINER_OF", fid[t["post_forum"]], poid, None),
        ("HAS_TAG", poid, tid[t["post_tag"]], None),
        ("HAS_CREATOR", cid, pid[t["cmt_creator"]], None),
        ("REPLY_OF", cid, poid[t["cmt_reply_of"]], None),
        ("HAS_MEMBER", fid[t["member_forum"]], pid[t["member_person"]],
         None),
    ])
    dt_import = time.perf_counter() - t0
    emit({"metric": "ldbc_bulk_import", "value": round(dt_import, 2),
          "unit": "s",
          "entities_per_s": round((n_nodes + n_edges) / dt_import)})

    t0 = time.perf_counter()
    for lbl in ("Person", "Post", "Comment", "Forum"):
        g.query(f"CREATE INDEX FOR (x:{lbl}) ON (x.id)")
    emit({"metric": "ldbc_index_build",
          "value": round(time.perf_counter() - t0, 2), "unit": "s"})

    # sanity counts through the query path
    assert g.query("MATCH (p:Person) RETURN count(*)").result_set == [[P]]
    assert g.query("MATCH (:Person)-[:KNOWS]->(:Person) RETURN count(*)"
                   ).result_set == [[len(t["knows_a"])]]

    def timed(name, cypher, params, oracle_rows):
        best = float("inf")
        for _ in range(reps):
            q0 = time.perf_counter()
            r = g.query(cypher, params)
            best = min(best, time.perf_counter() - q0)
        got = [tuple(row) for row in r.result_set]
        ok = got == oracle_rows
        emit({"metric": f"ldbc_{name}", "value": round(best * 1e3, 2),
              "unit": "ms", "rows": len(got), "parity": ok})
        if not ok:
            print("EXPECT", oracle_rows[:5], file=sys.stderr)
            print("GOT   ", got[:5], file=sys.stderr)
            raise SystemExit(f"parity FAILED on {name}")

    # IS1: person profile by id (index seek)
    k = 1234 % P
    timed("is1_profile",
          "MATCH (p:Person {id: $id}) "
          "RETURN p.firstName, p.lastName, p.birthday",
          {"id": int(t["person_id"][k])},
          [(t["person_first"][k], t["person_last"][k], t["person_bday"][k])])

    # IS2: recent posts of a person (ORDER BY DESC LIMIT)
    k = 777 % P
    sel = np.nonzero(t["post_creator"] == k)[0]
    rows = sorted(((t["post_date"][i], int(t["post_id"][i])) for i in sel),
                  key=lambda r: (r[0], r[1]), reverse=True)[:10]
    timed("is2_recent_posts",
          "MATCH (post:Post)-[:HAS_CREATOR]->(:Person {id: $id}) "
          "RETURN post.creationDate, post.id "
          "ORDER BY post.creationDate DESC, post.id DESC LIMIT 10",
          {"id": int(t["person_id"][k])}, rows)

    # IS3: friends with since (undirected), ordered
    k = k3 = 4242 % P
    fr = ([(int(t["person_id"][b]), int(s)) for a, b, s in
           zip(t["knows_a"], t["knows_b"], t["knows_since"]) if a == k]
          + [(int(t["person_id"][a]), int(s)) for a, b, s in
             zip(t["knows_a"], t["knows_b"], t["knows_since"]) if b == k])
    fr.sort(key=lambda r: (-r[1], r[0]))
    timed("is3_friends",
          "MATCH (:Person {id: $id})-[kn:KNOWS]-(f:Person) "
          "RETURN f.id, kn.since ORDER BY kn.since DESC, f.id ASC",
          {"id": int(t["person_id"][k])}, fr)

    # IS7-style: replies to a person's posts with reply author
    k = 99 % P
    my_posts = set(np.nonzero(t["post_creator"] == k)[0].tolist())
    rep_rows = sorted(
        (int(t["cmt_id"][i]), int(t["person_id"][t["cmt_creator"][i]]))
        for i in np.nonzero(np.isin(t["cmt_reply_of"],
                                    list(my_posts)))[0])
    timed("is7_replies",
          "MATCH (m:Comment)-[:REPLY_OF]->(:Post)-[:HAS_CREATOR]->"
          "(:Person {id: $id}), (m)-[:HAS_CREATOR]->(ra:Person) "
          "RETURN m.id, ra.id ORDER BY m.id ASC",
          {"id": int(t["person_id"][k])}, rep_rows)

    # aggregation: posts per creator, top 10
    cnt = np.bincount(t["post_creator"], minlength=P)
    order = sorted(range(P), key=lambda i: (-cnt[i], t["person_id"][i]))[:10]
    agg_rows = [(int(t["person_id"][i]), int(cnt[i])) for i in order]
    timed("agg_posts_per_creator",
          "MATCH (post:Post)-[:HAS_CREATOR]->(c:Person) "
          "RETURN c.id, count(post) AS cnt "
          "ORDER BY cnt DESC, c.id ASC LIMIT 10", {}, agg_rows)

    # IC-style 2-hop: distinct friends-of-friends count
    k = 5 % P
    adj = {}
    for a, b in zip(t["knows_a"], t["knows_b"]):
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    friends = adj.get(k, set())
    fof = set()
    for f in friends:
        fof |= adj.get(f, set())
    fof -= friends | {k}
    timed("ic_fof_count",
          "MATCH (p:Person {id: $id})-[:KNOWS*2..2]-(fof:Person) "
          "WHERE fof.id <> $id AND NOT (p)-[:KNOWS]-(fof) "
          "RETURN count(DISTINCT fof.id)",
          {"id": int(t["person_id"][k])}, [(len(fof),)])

    # ---- interleaved delta updates (BASELINE config 4) ----
    t0 = time.perf_counter()
    g.query("UNWIND range(0, 499) AS i "
            "CREATE (:Person {id: 900000 + i, firstName: 'New'})")
    target = int(t["person_id"][k3])
    g.query("MATCH (a:Person {id: $id}) "
            "UNWIND range(0, 49) AS i "
            "MATCH (b:Person {id: 900000 + i}) "
            "CREATE (a)-[:KNOWS {since: 2024}]->(b)", {"id": target})
    r = g.query("MATCH (:Person {id: $id})-[kn:KNOWS]-(f:Person) "
                "RETURN count(*)", {"id": target})
    assert r.result_set == [[len(fr) + 50]], (r.result_set, len(fr) + 50)
    r = g.query("MATCH (p:Person) WHERE p.id >= 900000 RETURN count(*)")
    assert r.result_set == [[500]]
    g.query("MATCH (p:Person) WHERE p.id >= 900000 DETACH DELETE p")
    r = g.query("MATCH (:Person {id: $id})-[kn:KNOWS]-(f:Person) "
                "RETURN count(*)", {"id": target})
    assert r.result_set == [[len(fr)]]
    assert g.query("MATCH (p:Person) RETURN count(*)").result_set == [[P]]
    # index still consistent after the delta cycle
    timed("is3_friends_after_updates",
          "MATCH (:Person {id: $id})-[kn:KNOWS]-(f:Person) "
          "RETURN f.id, kn.since ORDER BY kn.since DESC, f.id ASC",
          {"id": target}, fr)
    emit({"metric": "ldbc_interleaved_updates",
          "value": round(time.perf_counter() - t0, 2), "unit": "s",
          "parity": True})
    emit({"metric": "ldbc_parity", "value": 1, "unit": "bool",
          "entities": n_nodes + n_edges})


if __name__ == "__main__":
    sys.exit(main())
