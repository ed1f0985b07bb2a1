"""Scd2Table — incrementally-accumulated Type-2 history (plans/scd2.py,
dbt-snapshot analog): interval open/close on source changes, exactly-once
per source version, and as_of(v) == the source's own time travel."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.plans.scd2 import Scd2Table

from test_lake_merge import SCHEMA, ev

DOCS = [
    (1, "I", "r1", "a", "c1", "py", "one"),
    (2, "I", "r1", "b", "c1", "py", "two"),
    (3, "I", "r2", "c", "c1", "go", "three"),
]


def _src(spark, tmp, *, retain_history=8):
    t = ParquetSnapshotTable(
        spark, str(tmp / "src"), n_buckets=4, retain_history=retain_history
    )
    t.ensure(SCHEMA)
    return t


def _hist(spark, tmp, src, **kw):
    kw.setdefault("track_cols", ["lang", "content"])
    return Scd2Table(spark, str(tmp / "hist"), src, n_buckets=4, **kw)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_bootstrap_and_interval_lifecycle(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    h = _hist(spark, tmp_path, src)
    r = h.sync()
    assert r["mode"] == "bootstrap" and r["applied"]
    v0 = r["to_version"]
    assert _rows(h.current()) == _rows(
        src.read().select("repo", "path", "commit", "lang", "content")
    )
    # update one key, delete another, insert a new one
    src.merge(
        ev(
            spark,
            [
                (10, "U", "r1", "a", "c1", "py", "one-v2"),
                (11, "D", "r1", "b", "c1", None, None),
                (12, "I", "r3", "d", "c1", "rs", "four"),
            ],
        ),
        job="j",
        batch_id=1,
    )
    r = h.sync()
    assert r["mode"] == "incremental" and r["applied"]
    v1 = r["to_version"]
    hist = {
        (x["repo"], x["path"], x["valid_from_v"]): x for x in h.read().collect()
    }
    # updated key: old interval closed at v1, new one open
    assert hist[("r1", "a", v0)]["valid_to_v"] == v1
    assert hist[("r1", "a", v0)]["content"] == "one"
    assert hist[("r1", "a", v1)]["valid_to_v"] is None
    assert hist[("r1", "a", v1)]["content"] == "one-v2"
    # deleted key: closed, nothing reopened
    assert hist[("r1", "b", v0)]["valid_to_v"] == v1
    assert ("r1", "b", v1) not in hist
    # untouched key: still open from v0
    assert hist[("r2", "c", v0)]["valid_to_v"] is None
    # inserted key: open from v1
    assert hist[("r3", "d", v1)]["valid_to_v"] is None
    # point-in-time reconstruction equals the source's own time travel
    for v in (v0, v1):
        assert _rows(h.as_of(v)) == _rows(
            src.read(version=v).select("repo", "path", "commit", "lang", "content")
        )
    assert _rows(h.current()) == _rows(h.as_of(v1))


def test_sync_noop_and_fresh_instance_cursor(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    h = _hist(spark, tmp_path, src)
    v = h.sync()["to_version"]
    assert h.sync()["mode"] == "noop"
    again = Scd2Table(
        spark, str(tmp_path / "hist"), src, n_buckets=4,
        track_cols=["lang", "content"],
    )
    assert again.cursor() == v
    assert again.sync(to_version=v)["mode"] == "noop"


def test_flapping_key_keeps_all_intervals(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "x1")]), job="j", batch_id=0)
    h = _hist(spark, tmp_path, src)
    v0 = h.sync()["to_version"]
    src.merge(ev(spark, [(2, "D", "r1", "a", "c1", None, None)]), job="j", batch_id=1)
    v1 = h.sync()["to_version"]
    src.merge(ev(spark, [(3, "I", "r1", "a", "c1", "py", "x2")]), job="j", batch_id=2)
    v2 = h.sync()["to_version"]
    ivals = sorted(
        (r["valid_from_v"], r["valid_to_v"], r["content"])
        for r in h.read().where(F.col("path") == "a").collect()
    )
    assert ivals == [(v0, v1, "x1"), (v2, None, "x2")]
    assert h.as_of(v1).where(F.col("path") == "a").count() == 0
    assert _rows(h.as_of(v2)) == _rows(
        src.read().select("repo", "path", "commit", "lang", "content")
    )


def test_history_follows_ingest_job_stream(spark, tmp_path):
    """Scd2Table attached via IngestJob.follow() accumulates intervals
    per micro-batch and stays exactly-once across a redelivery."""
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, write_event_log

    src_log = str(tmp_path / "log")
    write_event_log(gen_change_events(spark, 600), src_log, n_files=6)
    t = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"), n_buckets=4, retain_history=8
    )
    h = Scd2Table(
        spark, str(tmp_path / "hist"), t, n_buckets=4,
        track_cols=["lang", "content"],
    )
    job = (
        IngestJob("scd2-stream", max_files_per_trigger=2)
        .source(src_log)
        .schema(IngestJob.default_payload_schema())
        .sink(t)
        .follow(h)
        .build()
    )
    ckpt = str(tmp_path / "ckpt")
    job.start_stream(spark, ckpt).awaitTermination()
    assert h.cursor() == t.current_version()
    assert _rows(h.current()) == _rows(
        t.read().select("repo", "path", "commit", "lang", "content")
    )
    # every synced version reconstructs from intervals
    for hh in t.history():
        v = hh["version"]
        assert _rows(h.as_of(v)) == _rows(
            t.read(version=v).select("repo", "path", "commit", "lang", "content")
        ), v
    ver = t.current_version()
    job.start_stream(spark, ckpt).awaitTermination()  # redelivery: all noop
    assert t.current_version() == ver and h.cursor() == ver


def test_expired_cursor_raises(spark, tmp_path):
    """History cannot be rebuilt across a retention gap without losing the
    intermediate intervals — sync must fail loudly, not fabricate."""
    import glob
    import os

    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    h = _hist(spark, tmp_path, src)
    h.sync()
    src.merge(
        ev(spark, [(10, "U", "r1", "a", "c1", "py", "one-v2")]), job="j", batch_id=1
    )
    for p in glob.glob(os.path.join(src.root, "history", "manifest.v*.json")):
        if not p.endswith(f"v{src.current_version()}.json"):
            os.remove(p)
    with pytest.raises(SinkCommitError):
        h.sync()
