"""scripts/replay_anchor.py — tiny-scale structural test.

The 10⁸-event artifact (BENCH/replay_anchor_1e8.json) is produced by this
script; this test pins its contract at 2×10⁴ events so the anchor tool
itself stays green: rc 0, one JSON line with per-commit walls for every
chunk, and fp_equal=True (replay under a different commit schedule lands
the identical all-column state fingerprint — the north-rule reconvergence
invariant the big run relies on).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_replay_anchor_tiny_reconverges():
    fixture = os.path.join(REPO, ".fixtures", "bench", "events_20000_r4")
    shutil.rmtree(fixture, ignore_errors=True)  # exercise gen too
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "replay_anchor.py"),
         "--events", "20000", "--cpus", "4", "--n-chunks", "3",
         "--verify-chunks", "2", "--content-reps", "4"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    r = json.loads(line)
    assert r["fp_equal"] is True
    assert len(r["per_commit_s"]) == 3
    assert r["events"] >= 20000 and r["final_rows"] > 0
    # fingerprint covers the full output schema incl. the sha256 invariant
    assert "content_sha" in r["fingerprint_cols"]
