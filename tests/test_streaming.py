"""B1/B2/B3/B13 — Structured Streaming ingest: availableNow tail of the log
dir, stateful dedup within watermark, checkpoint resume, and equality with
both the batch replay and the DuckDB golden oracle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.job import IngestJob
from wprdc_etl_spark.testgen import gen_change_events, golden_final_state_sql, write_event_log

N_EVENTS = 2500


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("slog") / "events"
    write_event_log(gen_change_events(spark, N_EVENTS), str(d), n_files=12)
    return str(d)


@pytest.fixture(scope="module")
def golden(log_dir):
    con = duckdb.connect()
    rows = con.execute(
        golden_final_state_sql(f"read_parquet('{log_dir}/*.parquet')")
    ).fetchall()
    con.close()
    return {tuple(r) for r in rows}


def engine_state(table):
    return {
        (r["repo"], r["path"], r["commit"], r["lang"], r["content_sha"])
        for r in table.read().select("repo", "path", "commit", "lang", "content_sha").collect()
    }


def make_job(spark, tmp, log_dir, name):
    table = ParquetSnapshotTable(spark, str(tmp / "tbl"), n_buckets=8)
    # watermark must cover the max event-time disorder in the log (the
    # generator pulls late events a full day early); anything older than the
    # watermark is dropped by the stateful dedup — that is the documented
    # contract (B2), exercised separately in test_watermark_drops_very_late.
    job = (
        IngestJob(name, max_files_per_trigger=3, watermark_delay="48 hours")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    return job, table


def test_stream_matches_golden(spark, tmp_path, log_dir, golden):
    job, table = make_job(spark, tmp_path, log_dir, "stream1")
    q = job.start_stream(spark, str(tmp_path / "ckpt"))
    q.awaitTermination(600)
    assert engine_state(table) == golden
    # multiple micro-batches actually ran (12 files / 3 per trigger)
    n_batches = table.read_lineage().select("batch_id").distinct().count()
    assert n_batches >= 4


def test_stream_restart_from_checkpoint(spark, tmp_path, log_dir, golden):
    """Kill after the stream has fully drained, append new log segments,
    restart with the same checkpoint → only the new files are processed and
    the final state reconverges (B13)."""
    job, table = make_job(spark, tmp_path, log_dir, "stream2")
    ckpt = str(tmp_path / "ckpt2")
    job.start_stream(spark, ckpt).awaitTermination(600)
    assert engine_state(table) == golden
    last_batch = table.last_committed_batch("stream2")

    # append a second wave of events to the same log dir
    wave2 = gen_change_events(spark, 400, with_anomalies=False).withColumn(
        "event_sequence", F.col("event_sequence") + 1_000_000
    ).withColumn("event_ts", F.timestamp_seconds(F.lit(1_700_010_000) + F.col("event_sequence") / 1000))
    wave2.repartitionByRange(4, "event_sequence").write.mode("append").parquet(log_dir)

    job2, table2 = make_job(spark, tmp_path, log_dir, "stream2")
    table2.root = table.root  # same table
    q = job2.start_stream(spark, ckpt)
    q.awaitTermination(600)
    assert table.last_committed_batch("stream2") > last_batch

    # golden for the union of both waves
    con = duckdb.connect()
    rows = con.execute(
        golden_final_state_sql(f"read_parquet('{log_dir}/*.parquet')")
    ).fetchall()
    con.close()
    assert engine_state(table) == {tuple(r) for r in rows}


def test_late_events_dropped_in_streaming(spark, tmp_path):
    """B2 at the apply layer: with ``lateness`` set, an event arriving in a
    later micro-batch with event_ts far behind the job's high watermark is
    dropped and counted in lineage (rows_late) — Spark's own watermark only
    bounds dedup state; the engine's lateness rule is the deterministic
    contract. Files process one per trigger, on-time wave first."""
    log = str(tmp_path / "latelog")
    on_time = gen_change_events(spark, 300, with_anomalies=False)
    on_time.coalesce(1).write.parquet(log)  # part-0000… (first trigger)
    # one very-late insert: event_ts 10 days before the wave, new key
    late = spark.createDataFrame(
        [(999_999, "I", "late/repo", "p", "c" * 40, "py", "late-content")],
        ["event_sequence", "op", "repo", "path", "commit", "lang", "content"],
    ).withColumn("event_ts", F.timestamp_seconds(F.lit(1_700_000_000 - 10 * 86_400)))
    late.select(
        "event_sequence", "event_ts", "op", "repo", "path", "commit", "lang", "content"
    ).coalesce(1).write.mode("append").parquet(log)

    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("latejob", max_files_per_trigger=1, watermark_delay="48 hours",
                  lateness="1 hour")
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.start_stream(spark, str(tmp_path / "ckpt")).awaitTermination(600)
    assert table.read().where(F.col("repo") == "late/repo").count() == 0
    late_total = (
        table.read_lineage().where(F.col("partition") == -1).agg(F.sum("rows_late")).collect()[0][0]
    )
    assert late_total >= 1


def test_stream_then_rerun_is_noop(spark, tmp_path, log_dir):
    """Re-starting a fully-drained stream applies nothing (source offsets in
    the checkpoint + sink guard)."""
    job, table = make_job(spark, tmp_path, log_dir, "stream3")
    ckpt = str(tmp_path / "ckpt3")
    job.start_stream(spark, ckpt).awaitTermination(600)
    v = table._read_manifest()["version"]
    job.start_stream(spark, ckpt).awaitTermination(600)
    assert table._read_manifest()["version"] == v


def test_session_stats_streaming_matches_batch(spark, tmp_path):
    """F.session_window streaming sessions == batch gaps-and-islands
    session_stats on the same events (a far-future sentinel key advances the
    watermark past every real session so append mode emits them all)."""
    import datetime as dt

    from wprdc_etl_spark.operators.relational import session_stats
    from wprdc_etl_spark.streaming.windows import session_stats_streaming

    T0 = dt.datetime(2024, 1, 1, 9, 0)
    M = lambda m: T0 + dt.timedelta(minutes=m)
    rows = [
        ("u", M(0), 1.0), ("u", M(10), 2.0),      # session 1 (gap 20m)
        ("u", M(90), 4.0), ("u", M(95), 8.0),     # session 2
        ("v", M(5), 16.0),                        # v session 1
        ("zz", M(14 * 60), 0.0),                  # watermark sentinel
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "value"])
    src = str(tmp_path / "sess_src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = session_stats_streaming(
        stream, key="user", ts="ts", gap_seconds=1200,
        watermark_delay="1 minute", value_col="value",
    )
    got = []
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .foreachBatch(lambda b, i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)

    stream_rows = {
        (r["user"], r["session_start"]): (r["session_end"], r["n_events"], r["value_sum"])
        for r in got if r["user"] != "zz"
    }
    batch = session_stats(
        df.where(F.col("user") != "zz"),
        key="user", ts="ts", gap_seconds=1200, value_col="value",
    ).collect()
    batch_rows = {
        (r["user"], r["session_start"]): (r["session_end"], r["n_events"], r["value_sum"])
        for r in batch
    }
    assert stream_rows == batch_rows and len(stream_rows) == 3


def test_tumbling_stats_batch_and_streaming_agree(spark, tmp_path):
    """tumbling_stats: µs-exact fixed windows; the streaming form (with a
    watermark, append mode) emits exactly the batch form's rows — the
    replay-reconverges contract for windowed aggregation."""
    import datetime as dt

    from wprdc_etl_spark.streaming.windows import tumbling_stats

    T0 = dt.datetime(2024, 1, 1, 9, 0)
    M = lambda m, s=0: T0 + dt.timedelta(minutes=m, seconds=s)
    rows = [
        ("u", M(0), 1.0), ("u", M(4, 59), 2.0),    # window [9:00, 9:05)
        ("u", M(5), 4.0),                          # window [9:05, 9:10) — boundary
        ("v", M(7), 8.0),
        ("zz", M(14 * 60), 0.0),                   # watermark sentinel
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "value"])

    batch = tumbling_stats(df, key="user", ts="ts", window_seconds=300,
                           value_col="value")
    got_b = {
        (r["user"], r["window_start"]): (r["window_end"], r["n_events"], r["value_sum"])
        for r in batch.collect() if r["user"] != "zz"
    }
    assert got_b[("u", M(0))] == (M(5), 2, 3.0)    # 9:04:59 stays in window 1
    assert got_b[("u", M(5))] == (M(10), 1, 4.0)   # boundary starts window 2
    assert got_b[("v", M(5))] == (M(10), 1, 8.0)
    assert len(got_b) == 3

    src = str(tmp_path / "tumb_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = tumbling_stats(stream, key="user", ts="ts", window_seconds=300,
                         value_col="value", watermark_delay="1 minute")
    got = []
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tumb_ckpt"))
        .foreachBatch(lambda b, i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got_s = {
        (r["user"], r["window_start"]): (r["window_end"], r["n_events"], r["value_sum"])
        for r in got if r["user"] != "zz"
    }
    assert got_s == got_b


def test_sliding_stats_batch_and_streaming_agree(spark, tmp_path):
    """sliding_stats: each event lands in window/slide overlapping windows;
    streaming (watermarked, append) emits exactly the batch rows."""
    import datetime as dt

    from wprdc_etl_spark.streaming.windows import sliding_stats

    T0 = dt.datetime(2024, 1, 1, 9, 0)
    M = lambda m, s=0: T0 + dt.timedelta(minutes=m, seconds=s)
    rows = [
        ("u", M(2), 1.0),     # windows [8:56,9:04) and [9:00,9:08)
        ("u", M(5), 2.0),     # windows [9:00,9:08) and [9:04,9:12)
        ("zz", M(14 * 60), 0.0),
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "value"])
    batch = sliding_stats(df, key="user", ts="ts", window_seconds=480,
                          slide_seconds=240, value_col="value")
    got_b = {
        (r["user"], r["window_start"]): (r["n_events"], r["value_sum"])
        for r in batch.collect() if r["user"] != "zz"
    }
    assert got_b[("u", M(-4))] == (1, 1.0)
    assert got_b[("u", M(0))] == (2, 3.0)   # both events share [9:00,9:08)
    assert got_b[("u", M(4))] == (1, 2.0)
    assert len(got_b) == 3

    src = str(tmp_path / "slide_src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = sliding_stats(stream, key="user", ts="ts", window_seconds=480,
                        slide_seconds=240, value_col="value",
                        watermark_delay="1 minute")
    got = []
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "slide_ckpt"))
        .foreachBatch(lambda b, i: got.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got_s = {
        (r["user"], r["window_start"]): (r["n_events"], r["value_sum"])
        for r in got if r["user"] != "zz"
    }
    assert got_s == got_b


def test_stream_interval_join_equals_batch(spark, tmp_path):
    """Inner stream-stream join over a drained finite log == the plain batch
    range join, boundaries inclusive on both ends."""
    import datetime as dt

    from wprdc_etl_spark.streaming.joins import stream_interval_join

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        ("c1", "u1", ts(0), "click", 0.0),
        ("c2", "u1", ts(60), "click", 0.0),    # exactly at upper bound of p1
        ("c3", "u1", ts(61), "click", 0.0),    # just past it
        ("c4", "u2", ts(10), "click", 0.0),    # other user
        ("p1", "u1", ts(0), "purchase", 5.0),
        ("p2", "u2", ts(10), "purchase", 7.0),  # lower bound: click at same ts
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value"]
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def side(kind, cols):
        return (
            spark.readStream.schema(schema).parquet(src)
            .where(F.col("event_type") == kind)
            .select(*cols)
        )

    clicks = side("click", ["event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")])
    buys = side("purchase", [
        "user_id", F.col("ts").cast("timestamp").alias("bts"), F.col("value"),
    ])
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        stream_interval_join(
            clicks, buys, on="user_id", left_ts="ts", right_ts="bts",
            lower_seconds=0, upper_seconds=3600, watermark_delay="0 seconds",
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
    got = {(r["event_id"], r["value"]) for r in spark.read.parquet(out_dir).collect()}
    assert got == {("c1", 5.0), ("c2", 5.0), ("c4", 7.0)}


def test_stream_interval_join_rejects_bad_bounds(spark):
    from wprdc_etl_spark.streaming.joins import stream_interval_join

    with pytest.raises(ValueError, match="lower"):
        stream_interval_join(
            spark.range(1), spark.range(1), on="id", left_ts="ts",
            right_ts="ts", lower_seconds=10, upper_seconds=5,
        )
