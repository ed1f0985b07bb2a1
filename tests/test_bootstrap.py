"""Snapshot bootstrap → log-tail handoff (Debezium snapshot.mode=initial
analog; streaming/job.py::IngestJob.bootstrap_snapshot).

Correctness contract: a consistent snapshot taken at log position C, applied
as the initial load, followed by the incremental tail, must reproduce the
full-log golden replay EXACTLY — with the tail cut at C (the efficient
handoff) and, critically, with the tail NOT cut at all (full overlap): the
metadata LWW makes redelivery across the handoff boundary idempotent, so no
coordination between snapshotter and tailer is needed.

The snapshot is built ENGINE-INDEPENDENTLY (the golden prefix replay run by
Spark SQL itself), so the handoff equivalence is not circular; the final
oracle is the DuckDB golden over the whole log, same as test_job_e2e.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import InvalidConfigException
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.job import IngestJob
from wprdc_etl_spark.testgen import (
    gen_change_events,
    golden_final_state_sql,
    write_event_log,
)

N_EVENTS = 2500


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bootlog") / "events"
    write_event_log(gen_change_events(spark, N_EVENTS), str(d), n_files=6)
    return str(d)


@pytest.fixture(scope="module")
def golden(log_dir):
    con = duckdb.connect()
    rows = con.execute(
        golden_final_state_sql(f"read_parquet('{log_dir}/*.parquet')")
    ).fetchall()
    con.close()
    return {tuple(r) for r in rows}


@pytest.fixture(scope="module")
def cutoff(spark, log_dir):
    mx = spark.read.parquet(log_dir).agg(F.max("event_sequence")).collect()[0][0]
    return int(mx) // 2


@pytest.fixture(scope="module")
def snapshot(spark, log_dir, cutoff, tmp_path_factory):
    """The consistent snapshot at position `cutoff`, built by a plain Spark
    SQL prefix replay of the golden rule — NOT by the engine under test."""
    d = str(tmp_path_factory.mktemp("snap") / "state")
    spark.read.parquet(log_dir).where(
        F.col("event_sequence") <= cutoff
    ).createOrReplaceTempView("_boot_prefix")
    snap = spark.sql(
        golden_final_state_sql(
            "_boot_prefix", select_expr="repo, path, commit, lang, content"
        )
    )
    snap.write.mode("overwrite").parquet(d)
    spark.catalog.dropTempView("_boot_prefix")
    return d


def engine_state(table):
    return {
        (r["repo"], r["path"], r["commit"], r["lang"], r["content_sha"])
        for r in table.read()
        .select("repo", "path", "commit", "lang", "content_sha")
        .collect()
    }


def boot_job(spark, tmp, log_dir, snapshot, cutoff, *, since, name):
    table = ParquetSnapshotTable(spark, str(tmp / "tbl"), n_buckets=8)
    job = (
        IngestJob(name)
        .source(log_dir, since_sequence=since)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.bootstrap_snapshot(
        spark.read.parquet(snapshot), as_of_seq=cutoff
    )
    return table, job


def test_bootstrap_then_cut_tail_matches_full_replay(
    spark, tmp_path, log_dir, snapshot, cutoff, golden
):
    table, job = boot_job(
        spark, tmp_path, log_dir, snapshot, cutoff, since=cutoff, name="boot-cut"
    )
    job.run_batch(spark, n_chunks=3)
    assert engine_state(table) == golden


def test_bootstrap_with_full_overlap_tail_converges(
    spark, tmp_path, log_dir, snapshot, cutoff, golden
):
    """The no-coordination guarantee: replaying the ENTIRE log over the
    bootstrapped table (tail not cut at the watermark) converges to the same
    state — every pre-cutoff event loses the LWW to the snapshot image."""
    table, job = boot_job(
        spark, tmp_path, log_dir, snapshot, cutoff, since=None, name="boot-overlap"
    )
    job.run_batch(spark, n_chunks=2)
    assert engine_state(table) == golden


def test_bootstrap_is_guarded_exactly_once(
    spark, tmp_path, log_dir, snapshot, cutoff
):
    table, job = boot_job(
        spark, tmp_path, log_dir, snapshot, cutoff, since=cutoff, name="boot-guard"
    )
    v1 = table._read_manifest()["version"]
    # crash-replay of the initial load: same (default -1) id → guard no-op
    job.bootstrap_snapshot(spark.read.parquet(snapshot), as_of_seq=cutoff)
    assert table._read_manifest()["version"] == v1


def test_streaming_tail_honors_handoff_cut(
    spark, tmp_path, log_dir, snapshot, cutoff, golden
):
    """The stream path reads the same `since_sequence` cut (it lives in
    _decode, shared by both paths): bootstrap + availableNow tail == golden,
    and the tail's lineage never reports a pre-cutoff sequence."""
    table, job = boot_job(
        spark, tmp_path, log_dir, snapshot, cutoff, since=cutoff, name="boot-stream"
    )
    q = job.start_stream(spark, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination()
    assert engine_state(table) == golden


def test_bootstrap_missing_key_column_raises(spark, tmp_path, log_dir):
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("boot-bad")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    bad = spark.createDataFrame([("r", "f.py")], "repo string, path string")
    with pytest.raises(InvalidConfigException, match="commit"):
        job.bootstrap_snapshot(bad, as_of_seq=10)


def test_bootstrap_bypasses_txn_gate_and_patch(spark, tmp_path):
    """A txn-gated, patch-mode job can still take an initial snapshot: the
    snapshot batch is complete full-image state, so gating (no txn columns
    on snapshot rows) and patch normalization (snapshot NULLs are true
    NULLs) are bypassed for that ONE batch and restored for the tail."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("boot-gated", txn_gate=("txn_id", "txn_total"), patch=True)
        .source(str(tmp_path / "nolog"), since_sequence=5)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    snap = spark.createDataFrame(
        [("r1", "a.py", "c1", "py", "x = 1"), ("r2", "b.go", "c2", "go", "y")],
        "repo string, path string, commit string, lang string, content string",
    )
    job.bootstrap_snapshot(snap, as_of_seq=5)
    assert table.read().count() == 2
    assert job.txn_gate == ("txn_id", "txn_total") and job.patch is True
