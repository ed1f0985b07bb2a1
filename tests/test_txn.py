"""Transaction-consistent apply: gate batches to complete source
transactions (operators/txn.py)."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.operators.txn import gate_complete_txns, with_txn_metadata


def _log(spark, n=20, txn_size=4):
    df = spark.range(n).select(
        F.col("id").alias("event_sequence"),
        F.concat(F.lit("k"), (F.col("id") % 5).cast("string")).alias("key"),
    )
    return with_txn_metadata(df, txn_size=txn_size, n_events=n)


def _seqs(df):
    return sorted(r["event_sequence"] for r in df.collect())


def test_gate_holds_back_boundary_txn(spark):
    log = _log(spark, n=20, txn_size=4)
    chunk1 = log.where(F.col("event_sequence") < 10)  # cuts txn 2 (seqs 8..11)
    ready, pending = gate_complete_txns(chunk1)
    assert _seqs(ready) == list(range(8))
    assert _seqs(pending) == [8, 9]


def test_pending_carries_into_next_batch(spark):
    log = _log(spark, n=20, txn_size=4)
    chunk1 = log.where(F.col("event_sequence") < 10)
    chunk2 = log.where(F.col("event_sequence") >= 10)
    _, pending = gate_complete_txns(chunk1)
    ready2, pending2 = gate_complete_txns(chunk2, pending=pending)
    assert _seqs(ready2) == list(range(8, 20))
    assert pending2.count() == 0


@pytest.mark.parametrize("split", [1, 3, 7, 11, 19])
def test_batch_split_invariance(spark, split):
    """For ANY split point, the union of gated ready sets over the two
    batches is every event exactly once."""
    log = _log(spark, n=20, txn_size=4)
    c1 = log.where(F.col("event_sequence") < split)
    c2 = log.where(F.col("event_sequence") >= split)
    r1, p = gate_complete_txns(c1)
    r2, p2 = gate_complete_txns(c2, pending=p)
    assert sorted(_seqs(r1) + _seqs(r2)) == list(range(20))
    assert p2.count() == 0


def test_redelivery_does_not_fake_completeness(spark):
    """Duplicate deliveries of the same sequence must not count twice:
    a 4-event txn with two copies of 2 distinct events stays pending."""
    log = _log(spark, n=4, txn_size=4)
    two = log.where(F.col("event_sequence") < 2)
    dup = two.unionByName(two)
    ready, pending = gate_complete_txns(dup)
    assert ready.count() == 0
    assert pending.count() == 4  # both copies carried, still incomplete


def test_short_final_txn_completes_with_n_events(spark):
    log = _log(spark, n=10, txn_size=4)  # last txn has only 2 events
    ready, pending = gate_complete_txns(log)
    assert _seqs(ready) == list(range(10))
    assert pending.count() == 0


def test_overdelivery_treated_complete(spark):
    df = spark.createDataFrame(
        [(0, 7, 2), (1, 7, 2), (2, 7, 2)],
        "event_sequence long, txn_id long, txn_total long",
    )
    ready, pending = gate_complete_txns(df)
    assert ready.count() == 3 and pending.count() == 0


def test_gated_replay_reaches_ungated_final_state(spark, tmp_path):
    """End-to-end: a 3-batch gated replay through the real merge equals the
    single-batch ungated replay — transactions may straddle every boundary."""
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    n = 3000
    log_dir = str(tmp_path / "log")
    with_txn_metadata(
        gen_change_events(spark, n, with_anomalies=False), txn_size=7, n_events=n
    ).write.parquet(log_dir)
    ev = spark.read.parquet(log_dir)

    def run(tag, bounds):
        table = ParquetSnapshotTable(spark, str(tmp_path / tag), n_buckets=8)
        job = (
            IngestJob(tag)
            .source(log_dir)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        table.ensure(job.target_schema())
        pending = None
        lo = 0
        for i, hi in enumerate(bounds):
            chunk = ev.where(
                (F.col("event_sequence") >= lo) & (F.col("event_sequence") < hi)
            )
            ready, pending = gate_complete_txns(chunk, pending=pending)
            job.apply_batch(
                ready.drop("txn_id", "txn_total"), batch_id=i
            )
            lo = hi
        assert pending.count() == 0
        return table

    gated = run("gated", [1000, 2003, n])  # both cuts tear a 7-event txn
    golden = run("golden", [n])
    a = gated.read().select("repo", "path", "commit", "content_sha")
    b = golden.read().select("repo", "path", "commit", "content_sha")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_lag_report(spark, tmp_path):
    """Freshness: after applying only the first half, lag_report sees the
    committed high-water, the log head, and the exact backlog; after the
    second half it reports caught up."""
    from wprdc_etl_spark.operators.freshness import lag_report
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    n = 2000
    log_dir = str(tmp_path / "log")
    gen_change_events(spark, n, with_anomalies=False).write.parquet(log_dir)
    ev = spark.read.parquet(log_dir)
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    job = (
        IngestJob("lagjob")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    table.ensure(job.target_schema())
    job.apply_batch(ev.where(F.col("event_sequence") < 1200), batch_id=0)
    r = lag_report(ev, table, "lagjob").collect()[0]
    assert r["applied_seq"] == 1199
    assert r["head_seq"] == n - 1
    assert r["events_behind"] == n - 1200
    assert not r["caught_up"]
    # unknown job -> nothing applied, everything behind
    r0 = lag_report(ev, table, "nosuchjob").collect()[0]
    assert r0["applied_seq"] == -1 and r0["events_behind"] == n
    job.apply_batch(ev.where(F.col("event_sequence") >= 1200), batch_id=1)
    r2 = lag_report(ev, table, "lagjob").collect()[0]
    assert r2["caught_up"] and r2["events_behind"] == 0


def _txn_schema():
    from pyspark.sql import types as T

    from wprdc_etl_spark.streaming.job import event_struct

    return event_struct(
        [T.StructField("txn_id", T.LongType()), T.StructField("txn_total", T.LongType())]
    )


def test_job_txn_gate_run_batch(spark, tmp_path):
    """IngestJob(txn_gate=...): a chunked replay whose boundaries tear
    transactions converges to the ungated final state."""
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    n = 3000
    log_dir = str(tmp_path / "log")
    with_txn_metadata(
        gen_change_events(spark, n, with_anomalies=False), txn_size=7, n_events=n
    ).write.parquet(log_dir)

    def run(tag, gated, n_chunks):
        table = ParquetSnapshotTable(spark, str(tmp_path / tag), n_buckets=8)
        kw = {"txn_gate": ("txn_id", "txn_total")} if gated else {}
        job = (
            IngestJob(tag, **kw)
            .source(log_dir, event_schema=_txn_schema())
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        job.run_batch(spark, n_chunks=n_chunks)
        return {
            tuple(r)
            for r in table.read()
            .select("repo", "path", "commit", "content_sha")
            .collect()
        }

    assert run("gated", True, 3) == run("plain", False, 1)


def test_job_txn_gate_stream_restart_recovers_pending(spark, tmp_path):
    """Streaming txn gating with a persisted pending tail: drain part 1
    (ends mid-transaction), restart with a FRESH job object and the same
    checkpoint after part 2 arrives — the pending tail is recovered from
    txn_pending_dir and the final state equals the full golden replay."""
    import duckdb

    from wprdc_etl_spark.operators.freshness import lag_report
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, golden_final_state_sql

    n, cut = 3000, 2003  # 2003 % 7 != 0: the boundary tears txn 286
    full_dir = str(tmp_path / "full")
    with_txn_metadata(
        gen_change_events(spark, n, with_anomalies=False), txn_size=7, n_events=n
    ).write.parquet(full_dir)
    ev = spark.read.parquet(full_dir)
    log_dir = str(tmp_path / "slog")
    ev.where(F.col("event_sequence") < cut).repartitionByRange(
        4, "event_sequence"
    ).write.parquet(log_dir)

    pend = str(tmp_path / "pend")
    ckpt = str(tmp_path / "ckpt")

    def mk(name):
        table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
        job = (
            IngestJob(
                name,
                max_files_per_trigger=2,
                txn_gate=("txn_id", "txn_total"),
                txn_pending_dir=pend,
            )
            .source(log_dir, event_schema=_txn_schema())
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        return job, table

    job1, table1 = mk("txnstream")
    job1.start_stream(spark, ckpt).awaitTermination(600)
    # applied high-water stops at the last complete txn below the cut:
    # txn 286 spans 2002..2008, so 2001 is the last applied sequence
    r = lag_report(ev.where(F.col("event_sequence") < cut), table1, "txnstream").collect()[0]
    assert r["applied_seq"] == 2001
    import os
    assert any(d.startswith("b") for d in os.listdir(pend))

    # part 2 arrives; a FRESH job (new process) resumes from ckpt + pending dir
    ev.where(F.col("event_sequence") >= cut).repartitionByRange(
        2, "event_sequence"
    ).write.mode("append").parquet(log_dir)
    job2, table2 = mk("txnstream")
    job2.start_stream(spark, ckpt).awaitTermination(600)

    con = duckdb.connect()
    golden = {
        tuple(r)
        for r in con.execute(
            golden_final_state_sql(f"read_parquet('{full_dir}/*.parquet')")
        ).fetchall()
    }
    con.close()
    got = {
        (r["repo"], r["path"], r["commit"], r["lang"], r["content_sha"])
        for r in table2.read()
        .select("repo", "path", "commit", "lang", "content_sha")
        .collect()
    }
    assert got == golden
