"""scripts/gen_evidence_map.py — the query→driver-evidence manifest.

Cheap, Spark-free: runs the generator against the real repo artifacts and
checks the output's structural invariants, so a future registry/artifact
drift that would silently produce a wrong manifest fails here instead.
"""

import importlib.util
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "gen_evidence_map.py")
OUT = os.path.join(REPO, "docs", "EVIDENCE.md")


def _load_registry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_test", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries().keys()), set(mod.oracle_sql().keys())


def test_evidence_map_regenerates_and_covers_registry():
    res = subprocess.run(
        [sys.executable, SCRIPT], capture_output=True, text=True, timeout=120)
    assert res.returncode == 0, res.stderr
    registry, oracles = _load_registry()
    text = open(OUT).read()

    # one table row per registry query, in registry order
    rows = re.findall(r"^\| (\d+) \| `([a-z0-9_]+)` \| (r\d+|—) ", text, re.M)
    assert [name for _, name, _ in rows] == registry
    assert [int(i) for i, _, _ in rows] == list(range(1, len(registry) + 1))

    # every query with an oracle_sql entry is marked hash-gated
    hash_marked = set(re.findall(r"\| `([a-z0-9_]+)` \|[^|]*\|[^|]*\| hash \|", text))
    assert hash_marked == {q for q in registry if q in oracles}

    # the summary line agrees with the row count
    m = re.search(r"\*\*Summary:\*\* (\d+)/(\d+) registry queries", text)
    assert m and int(m.group(2)) == len(registry)
