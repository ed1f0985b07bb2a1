"""Randomized mid-flight crash/restart fuzz over the streaming ingest path
(B13 — the streaming complement of test_commit_fuzz.py's batch-side
interleavings): each trial repeatedly starts the availableNow stream, kills
it at a random point MID-DRAIN (after a random delay / random number of
trigger completions — in-flight micro-batches are aborted wherever they
happen to be), restarts from the same checkpoint, and finally lets one run
drain to completion.

Invariants per trial — exactly-once across arbitrary kill points:
  1. the final table equals the DuckDB golden replay (nothing lost by an
     aborted trigger, nothing double-applied by its replay);
  2. no physical duplicate key — replayed epochs hit the batch guard or
     the sequence-LWW, never append twice;
  3. lineage (job, batch_id) summary rows are unique (each micro-batch
     committed at most once even when Spark re-runs its epoch).

Kill timing is wall-clock random (seeded, but where a kill lands depends on
scheduler timing) — the invariants hold for EVERY interleaving, so
nondeterministic placement widens coverage across runs instead of flaking:
any failure is a real protocol violation, not a timing assumption.

The engine-side crash WINDOWS inside a single commit (pre-lineage,
pre-manifest-swap) are fuzzed deterministically in test_commit_fuzz.py;
this file fuzzes the orchestration layer above them: Spark's trigger
replay against the batch guard.
"""

import random
import time

import pytest
from pyspark.sql import functions as F

from tests.test_streaming import engine_state, golden, log_dir, make_job  # noqa: F401

N_TRIALS = 4
MAX_CYCLES = 4


def _drain_with_crashes(spark, tmp_path, log_dir, rng, name):
    job, table = make_job(spark, tmp_path, log_dir, name)
    ckpt = str(tmp_path / f"ckpt_{name}")
    for cycle in range(MAX_CYCLES):
        q = job.start_stream(spark, ckpt)
        # kill after a random slice of the drain: either a fixed random
        # delay or as soon as a random number of triggers completed
        deadline = time.monotonic() + rng.uniform(0.5, 6.0)
        want_triggers = rng.randint(0, 3)
        while q.isActive and time.monotonic() < deadline:
            if len([p for p in q.recentProgress if p["numInputRows"] > 0]) >= want_triggers:
                break
            time.sleep(0.2)
        if not q.isActive:
            break  # drained before the kill landed
        q.stop()
        q.awaitTermination(120)
    else:
        # final run: no kill, drain to completion
        q = job.start_stream(spark, ckpt)
        q.awaitTermination(600)
    return table


@pytest.mark.parametrize("trial", range(N_TRIALS))
def test_stream_crash_restart_fuzz(spark, tmp_path, log_dir, golden, trial):  # noqa: F811
    rng = random.Random(40_304_070 + trial)
    table = _drain_with_crashes(spark, tmp_path, log_dir, rng, f"cfz{trial}")

    assert engine_state(table) == golden                              # (1)
    rows = table.read().select("repo", "path", "commit").collect()
    triples = [(r["repo"], r["path"], r["commit"]) for r in rows]
    assert len(triples) == len(set(triples))                          # (2)
    summaries = (
        table.read_lineage()
        .where(F.col("partition") == -1)
        .select("job", "batch_id")
        .collect()
    )
    pairs = [(r["job"], r["batch_id"]) for r in summaries]
    assert len(pairs) == len(set(pairs))                              # (3)
