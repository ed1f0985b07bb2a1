"""Write-audit-publish (WAP) staged commits — Iceberg's stage-then-publish
workflow expressed in the snapshot table's linear history. The load-bearing
properties: staged data is invisible to every reader surface until ONE
atomic publish; an open chain can't be published accidentally by other
commits; abort restores the published state with rollback guard semantics;
the published version's files are GC-exempt while the chain is open."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

EV_SCHEMA = T.StructType(
    [T.StructField("event_sequence", T.LongType()), T.StructField("op", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)


def ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def mk(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    return t


def rows(df):
    return {(r["repo"], r["path"], r["commit"]): r["content"] for r in df.collect()}


B0 = [(10, "I", "r1", "a.py", "c1", "py", "aa")]
B1 = [(11, "I", "r1", "b.py", "c1", "py", "bb")]
B2 = [(12, "U", "r1", "a.py", "c1", "py", "aa2")]


def test_staged_invisible_until_publish(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)  # published baseline
    base = t.current_version()
    t.merge(ev(spark, B1), job="j", batch_id=1, staged=True)
    t.merge(ev(spark, B2), job="j", batch_id=2, staged=True)
    # readers: published view
    assert rows(t.read()) == {("r1", "a.py", "c1"): "aa"}
    assert t.lookup(repo="r1", path="b.py", commit="c1").count() == 0
    assert t.published_version() == base
    assert t.staged_versions() == [base + 1, base + 2]
    # auditor: staged head
    assert rows(t.read_staged()) == {
        ("r1", "a.py", "c1"): "aa2",
        ("r1", "b.py", "c1"): "bb",
    }
    v = t.publish()
    assert t.staged_versions() == []
    assert t.published_version() == v == t.current_version()
    assert rows(t.read()) == rows(t.read_staged())


def test_publish_noop_when_nothing_staged(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    v = t.current_version()
    assert t.publish() == v
    assert t.current_version() == v  # no empty commit


def test_never_staged_table_has_no_field(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    t.compact()
    man = json.load(open(os.path.join(str(tmp_path / "tbl"), "manifest.json")))
    assert "published_version" not in man  # zero-footprint back-compat


def test_maintenance_inside_open_chain_stays_staged(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    pub = t.current_version()
    t.merge(ev(spark, B1), job="j", batch_id=1, staged=True)
    t.compact()  # must NOT publish half an audit
    assert t.published_version() == pub
    assert rows(t.read()) == {("r1", "a.py", "c1"): "aa"}
    t.publish()
    assert rows(t.read())[("r1", "b.py", "c1")] == "bb"


def test_abort_staged_restores_and_allows_replay(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    t.merge(ev(spark, B1), job="j", batch_id=1, staged=True)
    v = t.abort_staged()
    assert t.staged_versions() == []
    assert t.published_version() == v == t.current_version()
    assert rows(t.read()) == {("r1", "a.py", "c1"): "aa"}
    # rollback semantics: the staged batch lost its guard entry → replay
    # re-applies it (fixed audit) and ordinary commits publish immediately
    r = t.merge(ev(spark, B1), job="j", batch_id=1)
    assert r.applied
    assert rows(t.read())[("r1", "b.py", "c1")] == "bb"


def test_published_files_survive_gc_during_long_chain(spark, tmp_path):
    t = mk(spark, tmp_path, retain_history=0)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    # a chain longer than retention, each staged commit rewriting bucket dirs
    for i in range(4):
        t.merge(
            ev(spark, [(20 + i, "U", "r1", "a.py", "c1", "py", f"v{i}")]),
            job="j", batch_id=1 + i, staged=True,
        )
    # the published version's data dirs must still be readable
    assert rows(t.read()) == {("r1", "a.py", "c1"): "aa"}
    assert rows(t.read_staged()) == {("r1", "a.py", "c1"): "v3"}
    t.publish()
    assert rows(t.read()) == {("r1", "a.py", "c1"): "v3"}


def test_changes_between_published_default(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    base = t.current_version()
    t.merge(ev(spark, B1), job="j", batch_id=1, staged=True)
    # default endpoint = published → no staged rows leak into the feed
    assert t.changes_between(base, compare_cols=["content"]).count() == 0
    # explicit staged endpoint is the audit surface
    ch = t.changes_between(base, t.current_version(), compare_cols=["content"])
    assert {r["change_op"] for r in ch.collect()} == {"I"}


def test_ingest_job_staged_end_to_end(spark, tmp_path):
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, write_event_log

    log = str(tmp_path / "log")
    write_event_log(gen_change_events(spark, 500), log, n_files=2)
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("wap-e2e", staged=True)
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(t)
        .build()
    )
    job.run_batch(spark, n_chunks=2)
    assert t.read().count() == 0  # whole replay staged, nothing published
    staged_n = t.read_staged().count()
    assert staged_n > 0
    t.publish()
    assert t.read().count() == staged_n


# ---- wall-clock time travel (rides the same commit-time stamps) -----------


def test_read_as_of_timestamp(spark, tmp_path):
    import time as _time

    t = mk(spark, tmp_path, retain_history=4)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    between = int(_time.time() * 1000)
    _time.sleep(0.05)
    t.merge(ev(spark, B2), job="j", batch_id=1)
    assert t.version_at_timestamp(between) < t.current_version()
    assert rows(t.read_as_of(between)) == {("r1", "a.py", "c1"): "aa"}
    assert rows(t.read_as_of(int(_time.time() * 1000))) == {("r1", "a.py", "c1"): "aa2"}
    with pytest.raises(Exception, match="no version"):
        t.version_at_timestamp(between - 10_000_000)
    h = t.history()
    assert all(e["committed_at_ms"] is not None for e in h)
    assert [e["committed_at_ms"] for e in h] == sorted(e["committed_at_ms"] for e in h)


def test_expire_older_than_keeps_young_snapshots_readable(spark, tmp_path):
    import time as _time

    # retain_history=4 keeps every version's dirs alive through the merges
    # (the rolling commit-time GC is governed by retain_history alone; the
    # age cutoff below narrows EXPIRE, it cannot resurrect dirs)
    t = mk(spark, tmp_path, retain_history=4)
    for i in range(5):
        t.merge(
            ev(spark, [(10 + i, "U", "r1", "a.py", "c1", "py", f"v{i}")]),
            job="j", batch_id=i,
        )
    # cutoff in the past + keep=1: nothing is old enough to expire, and the
    # age-survivors outside the keep window must STAY readable — expire's GC
    # widens its retention to the oldest surviving manifest (the
    # expire-vs-GC consistency rule)
    cutoff = int(_time.time() * 1000) - 60_000
    assert t.expire_snapshots(keep=1, older_than_ms=cutoff) == 0
    for v in range(1, t.current_version() + 1):
        t.read(version=v).count()  # raises if any data dir was GC'd
    # cutoff in the future: behaves like the plain version-window expire
    removed = t.expire_snapshots(keep=1, older_than_ms=int(_time.time() * 1000) + 60_000)
    assert removed > 0
    with pytest.raises(Exception):
        t.read(version=1).count()  # now genuinely expired


def test_dml_inside_open_chain_sees_staged_rows(spark, tmp_path):
    """DML commits on top of the head, so its predicate must see staged
    rows; the mutation itself stays staged until publish."""
    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    t.merge(ev(spark, B1), job="j", batch_id=1, staged=True)  # b.py staged
    t.delete_where(F.col("path") == "b.py")
    assert rows(t.read()) == {("r1", "a.py", "c1"): "aa"}  # still published-only
    assert ("r1", "b.py", "c1") not in rows(t.read_staged())  # staged row deleted
    t.publish()
    assert rows(t.read()) == {("r1", "a.py", "c1"): "aa"}


def test_rollup_and_replica_ignore_staged_chain(spark, tmp_path):
    """Downstream consumers (continuous aggregate, replica) must fold only
    PUBLISHED versions — an open audit chain stays out of both."""
    from wprdc_etl_spark.plans.replicate import TableReplicator
    from wprdc_etl_spark.plans.rollup import RollupView

    t = mk(spark, tmp_path)
    t.merge(ev(spark, B0), job="j", batch_id=0)
    view = RollupView(spark, str(tmp_path / "view"), t, group_cols=["repo"])
    view.refresh()
    rep_t = ParquetSnapshotTable(spark, str(tmp_path / "rep"), n_buckets=2)
    rep = TableReplicator(t, rep_t, job="r")
    rep.sync()

    t.merge(ev(spark, B1), job="j", batch_id=1, staged=True)
    assert view.refresh()["mode"] == "noop"  # staged chain invisible
    assert rep.sync()["mode"] == "noop"
    t.publish()
    assert view.refresh()["mode"] == "incremental"
    assert rep.sync()["mode"] == "incremental"
    assert rep_t.read().count() == 2
