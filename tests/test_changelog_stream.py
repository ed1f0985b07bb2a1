"""Streaming changelog source (streaming/changelog_source.py — the Delta
readChangeFeed analog): offsets are table versions; every micro-batch must
equal the batch ``changes_between`` over the same version pair, and a
checkpointed stream consumes each version range exactly once."""

import os

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.changelog_source import read_changelog_stream

from tests.test_lake_merge import EV_SCHEMA, SCHEMA, ev  # reuse helpers


def mk(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("retain_history", 16)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    return t


def drain(spark, root, name, ckpt, **kw):
    q = (
        read_changelog_stream(spark, root, **kw)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def drain_files(spark, root, out, ckpt, **kw):
    """File-sink drain: the memory sink refuses checkpoint RECOVERY, so the
    resume tests write parquet (fault-tolerant sink) and read the
    accumulated output back."""
    df = read_changelog_stream(spark, root, **kw)
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(df.schema).parquet(out)


def rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_equals_batch_changelog(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1"),
                       (1, "I", "r2", "b", "c2", "go", "w1")]), job="j", batch_id=0)
    v1 = t.current_version()
    t.merge(ev(spark, [(2, "U", "r1", "a", "c1", "py", "v2"),
                       (3, "D", "r2", "b", "c2", "go", None),
                       (4, "I", "r3", "c", "c3", "rs", "z1")]), job="j", batch_id=1)
    t.merge(ev(spark, [(5, "U", "r3", "c", "c3", "rs", "z2")]), job="j", batch_id=2)

    got = drain(spark, t.root, "clstream1", str(tmp_path / "ck1"),
                starting_version=v1)
    want = t.changes_between(v1)
    assert sorted(got.columns) == sorted(want.columns)
    assert rows_set(got.select(*want.columns)) == rows_set(want)
    # sanity on content: r2 deleted carrying the OLD payload
    d = [r for r in got.collect() if r["change_op"] == "D"]
    assert len(d) == 1 and d[0]["repo"] == "r2" and d[0]["content"] == "w1"


def test_stream_checkpoint_resume_exactly_once(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1")]), job="j", batch_id=0)
    v1 = t.current_version()
    t.merge(ev(spark, [(1, "I", "r2", "b", "c2", "go", "w1")]), job="j", batch_id=1)

    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")
    first = drain_files(spark, t.root, out, ckpt, starting_version=v1)
    assert {(r["repo"], r["change_op"]) for r in first.collect()} == {("r2", "I")}

    # new commits; the SAME checkpoint appends ONLY the new range
    t.merge(ev(spark, [(2, "U", "r2", "b", "c2", "go", "w2"),
                       (3, "I", "r4", "d", "c4", "js", "x1")]), job="j", batch_id=2)
    second = drain_files(spark, t.root, out, ckpt, starting_version=v1)
    rows = [(r["repo"], r["change_op"]) for r in second.collect()]
    assert sorted(rows) == [("r2", "I"), ("r2", "U"), ("r4", "I")]
    # replaying the drained checkpoint appends nothing (exactly-once)
    third = drain_files(spark, t.root, out, ckpt, starting_version=v1)
    assert third.count() == 3


def test_stream_empty_across_rebucket(spark, tmp_path):
    """A rebucket is state-preserving: a range spanning ONLY a rebucket
    must stream zero changes (exercises the cross-layout full-diff path)."""
    t = mk(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1"),
                       (1, "I", "r2", "b", "c2", "go", "w1")]), job="j", batch_id=0)
    v1 = t.current_version()
    t.rebucket(8)
    got = drain(spark, t.root, "clreb", str(tmp_path / "ckr"), starting_version=v1)
    assert got.count() == 0


def test_stream_default_start_is_current_head(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1")]), job="j", batch_id=0)
    # no startingVersion: only changes AFTER the stream's first offset
    ckpt, out = str(tmp_path / "ckh"), str(tmp_path / "outh")
    first = drain_files(spark, t.root, out, ckpt)
    assert first.count() == 0
    t.merge(ev(spark, [(1, "I", "r2", "b", "c2", "go", "w1")]), job="j", batch_id=1)
    second = drain_files(spark, t.root, out, ckpt)
    assert {r["repo"] for r in second.collect()} == {"r2"}


def test_stream_expired_start_fails_clean(spark, tmp_path):
    t = mk(spark, tmp_path, retain_history=0)
    # SAME key every batch: its bucket is rewritten each commit, so with
    # zero retention the old versions' data dirs are GC'd immediately
    for i in range(3):
        t.merge(ev(spark, [(i, "U", "r1", "p", "c", "py", f"v{i}")]),
                job="j", batch_id=i)
    with pytest.raises(Exception, match="history snapshot|expired|retain"):
        drain(spark, t.root, "clexp", str(tmp_path / "cke"), starting_version=1)


def test_stream_after_schema_evolution_null_fills_old_versions(spark, tmp_path):
    """The compare set is fixed from the HEAD schema at stream start; a
    version predating the evolution null-fills the new column — exactly
    the engine's own evolution semantics, so no spurious diffs appear and
    the new column rides the feed."""
    t = mk(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1")]), job="j", batch_id=0)
    v1 = t.current_version()
    evolved = ev(spark, [(1, "I", "r2", "b", "c2", "go", "w1")]).withColumn(
        "license", F.lit("MIT")
    )
    t.merge(evolved, job="j", batch_id=1)
    got = drain(spark, t.root, "clevo", str(tmp_path / "ckv"), starting_version=v1)
    assert "license" in got.columns  # head-schema compare set
    rows = {(r["repo"], r["change_op"], r["license"]) for r in got.collect()}
    # ONLY the new row surfaces; r1 (license null before AND after) is quiet
    assert rows == {("r2", "I", "MIT")}
    # and the shared columns agree with the batch changelog
    want = t.changes_between(v1)
    assert rows_set(got.select(*want.columns)) == rows_set(want)
