"""scripts/replay_anchor_rolling.py — tiny-scale equivalence + exactly-once.

The 10⁹-event artifact (BENCH/replay_anchor_1e9.json) relies on three
properties this test pins at 2×10⁴ events:

1. chunked generation ≡ full-generation slice (``gen_change_events(start=)``
   is closed-form per index, so segment-wise materialization of the log is
   byte-identical to slicing one full log);
2. rolling replay (generate → apply → retire segment) lands the same
   all-column state fingerprint as the standard one-shot replay of the same
   log through ``IngestJob.run_batch`` — i.e. retiring consumed segments
   changes nothing about the applied state;
3. the full-scale exactly-once probes hold: redelivering the final segment
   under its original batch_id is guarded into a no-op, and re-applying it
   as a NEW batch is a no-op by LWW on (key, event_sequence).
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from replay_anchor_rolling import run_rolling  # noqa: E402

from wprdc_etl_spark.operators.fingerprint import state_fingerprint
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.job import IngestJob
from wprdc_etl_spark.testgen import gen_change_events, write_event_log

N = 20_000
N_ENT = 4_000
REPS = 4


def test_chunked_generation_equals_full_slice(spark):
    full = gen_change_events(spark, N, n_entities=N_ENT, content_reps_max=REPS)
    lo, hi = 7_000, 14_000
    sliced = full.where(
        (full.event_sequence >= lo) & (full.event_sequence < hi)
    )
    chunk = gen_change_events(
        spark, hi - lo, start=lo, n_entities=N_ENT, content_reps_max=REPS
    )
    cols = sorted(chunk.columns)
    assert state_fingerprint(chunk, cols) == state_fingerprint(sliced, cols)
    # rows = window size + the generator's ~3% redelivered duplicates
    # (a pure function of event_sequence, hence boundary-safe)
    n = chunk.count()
    assert n == sliced.count() and n >= hi - lo


def test_rolling_replay_matches_one_shot(spark, tmp_path):
    scratch = str(tmp_path / "rolling")
    os.makedirs(scratch, exist_ok=True)
    report, job, table, last_seg = run_rolling(
        spark,
        events=N,
        n_chunks=4,
        n_entities=N_ENT,
        content_reps=REPS,
        n_buckets=8,
        scratch=scratch,
        progress=False,
    )
    assert report["events"] == N and report["n_chunks"] == 4
    cols = sorted(table.read().columns)
    assert "content_sha" in cols
    fp_rolling = state_fingerprint(table.read(), cols)

    # one-shot replay of the SAME log through the standard path
    log = str(tmp_path / "full_log")
    write_event_log(
        gen_change_events(spark, N, n_entities=N_ENT, content_reps_max=REPS),
        log, n_files=8,
    )
    target2 = str(tmp_path / "oneshot_target")
    table2 = ParquetSnapshotTable(spark, target2, n_buckets=8)
    job2 = (
        IngestJob("rolling-oneshot-twin")
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(table2)
        .build()
    )
    job2.run_batch(spark, n_chunks=2)
    assert state_fingerprint(table2.read(), cols) == fp_rolling

    # exactly-once probes on the rolling table, as the big run performs them
    assert last_seg is not None and os.path.exists(last_seg)
    src = job._decode(spark.read.schema(job._scan_schema()).parquet(last_seg))
    job.apply_batch(src, report["n_chunks"] - 1)  # original batch_id → guard
    assert state_fingerprint(table.read(), cols) == fp_rolling
    job.apply_batch(src, report["n_chunks"])  # new batch_id → LWW no-op
    assert state_fingerprint(table.read(), cols) == fp_rolling

    shutil.rmtree(scratch, ignore_errors=True)
