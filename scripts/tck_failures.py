"""Sweep all TCK scenarios; dump failures grouped by reason prefix."""
import collections
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import tck_runner as T
from falkordb_tpu import FalkorDB

scens = sorted(T.discover(T.TCK_FEATURES_DEFAULT), key=lambda s: s.sid)
db = FalkorDB()
passed, failed = [], []
for s in scens:
    if any(t in ("@skip", "@crash") for t in s.tags):
        continue
    try:
        r = T.run_scenario(db, s)
        ok, reason = r.ok, (r.reason or "")
    except Exception as e:
        ok, reason = False, f"HARNESS {type(e).__name__}: {e}"
    (passed if ok else failed).append((s.sid, reason))

print(f"pass={len(passed)} fail={len(failed)}")
buckets = collections.Counter()
examples = {}
for sid, reason in failed:
    key = reason.splitlines()[0][:100]
    buckets[key] += 1
    examples.setdefault(key, sid)
with open("/tmp/tck_failures.txt", "w") as f:
    for key, cnt in buckets.most_common():
        f.write(f"{cnt:5d}  {key}\n       e.g. {examples[key]}\n")
    f.write("\n== ALL FAILURES ==\n")
    for sid, reason in failed:
        f.write(f"{sid}\t{reason.splitlines()[0][:160] if reason else ''}\n")
print("wrote /tmp/tck_failures.txt")
for key, cnt in buckets.most_common(30):
    print(f"{cnt:5d}  {key}")
