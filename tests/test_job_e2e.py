"""End-to-end golden-state replay (SURVEY §6.2 #2-3) — the engine analog of
the reference's ``test/test_pipeline.py`` end-to-end shape: build job → run →
assert loaded rows + status/lineage.

Golden oracle: DuckDB replays the same generated event log with
``testgen.golden_final_state_sql`` (the single-process stand-in for the CKAN
server applying datastore_upsert). Equality is order-insensitive over
(repo, path, commit, content_sha) — the BASELINE.json per-row invariant.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import IncompletePipelineError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.job import IngestJob
from wprdc_etl_spark.testgen import gen_change_events, golden_final_state_sql, write_event_log

N_EVENTS = 3000


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("log") / "events"
    write_event_log(gen_change_events(spark, N_EVENTS), str(d), n_files=8)
    return str(d)


@pytest.fixture(scope="module")
def golden(log_dir):
    con = duckdb.connect()
    sql = golden_final_state_sql(f"read_parquet('{log_dir}/*.parquet')")
    rows = con.execute(sql).fetchall()
    con.close()
    golden_set = {tuple(r) for r in rows}
    assert len(golden_set) == len(rows)
    return golden_set


def engine_state(table):
    return {
        (r["repo"], r["path"], r["commit"], r["lang"], r["content_sha"])
        for r in table.read().select("repo", "path", "commit", "lang", "content_sha").collect()
    }


def run_replay(spark, tmp, log_dir, n_chunks, name="e2e"):
    table = ParquetSnapshotTable(spark, str(tmp / "tbl"), n_buckets=8)
    job = (
        IngestJob(name)
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.run_batch(spark, n_chunks=n_chunks)
    return table, job


@pytest.mark.parametrize("n_chunks", [1, 7])
def test_batch_replay_matches_duckdb_golden(spark, tmp_path, log_dir, golden, n_chunks):
    table, _ = run_replay(spark, tmp_path, log_dir, n_chunks)
    assert engine_state(table) == golden


def test_replay_twice_is_idempotent(spark, tmp_path, log_dir, golden):
    """Exactly-once (B8): re-running the same replay is a no-op."""
    table, job = run_replay(spark, tmp_path, log_dir, n_chunks=3)
    v1 = table._read_manifest()["version"]
    job.run_batch(spark, n_chunks=3)  # same batch ids → all skipped
    assert table._read_manifest()["version"] == v1
    assert engine_state(table) == golden


def test_resume_mid_replay_reconverges(spark, tmp_path, log_dir, golden):
    """B13: stop after k chunks, restart the whole plan → identical state."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    job = (
        IngestJob("resume")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    # run only the first 2 of 5 chunks, then "crash"
    df = spark.read.parquet(log_dir)
    max_seq = df.agg(F.max("event_sequence")).collect()[0][0] + 1
    table.ensure(job.target_schema())
    step = (max_seq + 4) // 5
    for i in range(2):
        chunk = df.where(
            (F.col("event_sequence") >= i * step) & (F.col("event_sequence") < (i + 1) * step)
        )
        job.apply_batch(chunk, i)
    # restart: replay ALL chunks from batch 0 — first 2 skip via guard
    job.run_batch(spark, n_chunks=5)
    assert engine_state(table) == golden


def test_lineage_accounts_for_anomalies(spark, tmp_path, log_dir):
    table, _ = run_replay(spark, tmp_path, log_dir, n_chunks=1, name="lin")
    lin = table.read_lineage().where(F.col("partition") == -1)
    row = lin.collect()[0]
    # generator injects ~1% invalid rows (FIXTURES §2) — all must be counted,
    # none thrown (the marshmallow-(data, errors) contract, SURVEY B5)
    assert row["rows_quarantined"] > 0
    assert row["rows_upserted"] > 0
    assert row["input_hash"] != ""


def test_late_events_dropped_and_counted(spark, tmp_path, log_dir):
    """B2 analog: with a lateness bound, events older than the previous
    batch's high watermark minus the bound are dropped and counted."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    job = (
        IngestJob("late", lateness="1 HOUR")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.run_batch(spark, n_chunks=4)
    late_total = (
        table.read_lineage().where(F.col("partition") == -1).agg(F.sum("rows_late")).collect()[0][0]
    )
    # generator pulls ~1% of events a full day earlier — chunks after the
    # first must see some of them as late
    assert late_total > 0


def test_quarantine_persisted(spark, tmp_path, log_dir):
    """B5: quarantined rows land in a per-batch parquet dir with their error
    report — the distributed marshmallow-errors analog — and re-replays
    don't duplicate them (idempotent per-batch overwrite)."""
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    qdir = str(tmp_path / "quarantine")
    job = (
        IngestJob("qjob", quarantine_dir=qdir)
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.run_batch(spark, n_chunks=2)
    q = spark.read.parquet(qdir)
    n_q = q.count()
    lineage_q = (
        table.read_lineage().where(F.col("partition") == -1).agg(F.sum("rows_quarantined")).collect()[0][0]
    )
    assert n_q == lineage_q > 0
    assert q.where(F.col("_errors") == "").count() == 0  # every row says why
    # replay: guard skips batches → quarantine unchanged
    job.run_batch(spark, n_chunks=2)
    assert spark.read.parquet(qdir).count() == n_q


def test_requeue_quarantine_after_schema_fix(spark, tmp_path, log_dir):
    """Dead-letter replay: quarantine rows re-validate under a corrected
    schema and merge exactly-once; the final state equals the golden replay
    computed WITH the relaxed rule — recovery costs O(bad rows), not O(log).
    (The reference's only recovery path is re-running the whole pipeline.)"""
    from wprdc_etl_spark.schema import event_payload_schema
    from wprdc_etl_spark.testgen import LANGS

    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    qdir = str(tmp_path / "quarantine")
    job = (
        IngestJob("rq", quarantine_dir=qdir)
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.run_batch(spark, n_chunks=3)

    # "rule fix ships": klingon is a language now
    relaxed = event_payload_schema(list(LANGS) + ["klingon"])
    r1 = job.requeue_quarantine(spark, schema=relaxed)
    assert sum(v["requeued"] for v in r1.values()) > 0  # klingon rows drained
    assert sum(v["still_bad"] for v in r1.values()) > 0  # null-content stays

    # final state == golden computed with the relaxed validity rule
    con = duckdb.connect()
    sql = golden_final_state_sql(
        f"read_parquet('{log_dir}/*.parquet')", known_langs=tuple(LANGS) + ("klingon",)
    )
    relaxed_golden = {tuple(r) for r in con.execute(sql).fetchall()}
    con.close()
    assert engine_state(table) == relaxed_golden

    # still-bad rows live on under a bumped generation; a second requeue with
    # the same schema drains nothing and leaves state + quarantine unchanged
    import os

    names = sorted(os.listdir(qdir))
    assert names and all(".g1" in n for n in names)
    n_left = spark.read.parquet(qdir).count()
    r2 = job.requeue_quarantine(spark, schema=relaxed)
    assert sum(v["requeued"] for v in r2.values()) == 0
    assert sum(v["still_bad"] for v in r2.values()) == n_left
    assert engine_state(table) == relaxed_golden
    assert spark.read.parquet(qdir).count() == n_left
    assert all(".g2" in n for n in sorted(os.listdir(qdir)))


def test_incomplete_pipeline_raises(spark):
    """A6 parity: Pipeline.enforce_full_pipeline → RuntimeError."""
    with pytest.raises(IncompletePipelineError):
        IngestJob("x").source("/tmp/nowhere").build()
    with pytest.raises(IncompletePipelineError):
        IngestJob("x").apply_batch(None, 0)


def test_schema_evolution_two_phase_replay(spark, tmp_path):
    """B9 e2e: phase 1 without license column, phase 2 with it (FIXTURES §2)."""
    ev = gen_change_events(spark, 1200, include_license=True)
    p1 = str(tmp_path / "log1")
    p2 = str(tmp_path / "log2")
    ev.where(F.col("event_sequence") < 1080).drop("license").write.parquet(p1)
    ev.where(F.col("event_sequence") >= 1080).write.parquet(p2)

    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    job = (
        IngestJob("evo")
        .source(p1)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    last = job.run_batch(spark, n_chunks=2)
    assert "license" not in table.read().columns

    from pyspark.sql import types as T

    from wprdc_etl_spark.schema import FieldSpec
    from wprdc_etl_spark.streaming.job import event_struct

    evolved_payload = IngestJob.default_payload_schema()
    evolved_payload.fields.append(FieldSpec("license", "string"))
    job2 = (
        IngestJob("evo")
        .source(p2, event_schema=event_struct([T.StructField("license", T.StringType())]))
        .schema(evolved_payload)
        .sink(table)
        .build()
    )
    job2.run_batch(spark, start_batch_id=last + 1)
    out = table.read()
    assert "license" in out.columns
    assert out.where(F.col("license").isNotNull()).count() > 0
    # pre-evolution rows read as null license
    assert out.where(F.col("license").isNull()).count() > 0


def test_multi_log_sharded_sources_match_golden(spark, tmp_path, log_dir, golden):
    """A key-sharded change log (one dir per shard, the binlog-per-shard CDC
    deployment) unioned via source([...]) must replay to the same golden
    final state as the single log — in batch AND streaming modes."""
    ev = spark.read.parquet(log_dir)
    shard0 = str(tmp_path / "shard0")
    shard1 = str(tmp_path / "shard1")
    by_key = F.pmod(F.xxhash64("repo", "path"), F.lit(2))
    ev.where(by_key == 0).write.parquet(shard0)
    ev.where(by_key == 1).write.parquet(shard1)

    tbl_b = ParquetSnapshotTable(spark, str(tmp_path / "tbl_b"), n_buckets=8)
    job = (
        IngestJob("multilog")
        .source([shard0, shard1])
        .schema(IngestJob.default_payload_schema())
        .sink(tbl_b)
        .build()
    )
    job.run_batch(spark, n_chunks=2)
    assert engine_state(tbl_b) == golden

    tbl_s = ParquetSnapshotTable(spark, str(tmp_path / "tbl_s"), n_buckets=8)
    sjob = (
        IngestJob("multilog-stream", max_files_per_trigger=4)
        .source([shard0, shard1])
        .schema(IngestJob.default_payload_schema())
        .sink(tbl_s)
        .build()
    )
    sjob.start_stream(spark, str(tmp_path / "ckpt")).awaitTermination()
    assert engine_state(tbl_s) == golden
