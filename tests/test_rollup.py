"""RollupView — continuous aggregate maintained from the changelog
(plans/rollup.py): bootstrap → incremental refresh → noop, retention-lag
fallback, and equality with a full recompute at every step."""

from pyspark.sql import functions as F

from wprdc_etl_spark.plans.rollup import RollupView

from test_lake_merge import ev, mk_table


def _merge(t, spark, rows, batch_id):
    t.merge(ev(spark, rows), job="rv", batch_id=batch_id)


def _recompute(t):
    return {
        r["repo"]: r["n_live"]
        for r in t.read().groupBy("repo").agg(F.count("*").alias("n_live")).collect()
    }


def _view_state(v):
    return {r["repo"]: r["n_live"] for r in v.read().collect()}


def test_rollup_view_lifecycle(spark, tmp_path):
    t = mk_table(spark, tmp_path, retain_history=8)
    v = RollupView(
        spark, str(tmp_path / "view"), t,
        group_cols=["repo"], compare_cols=["content"],
    )
    _merge(t, spark, [
        (1, "I", "r1", "a", "c1", "py", "x"),
        (2, "I", "r1", "b", "c1", "py", "y"),
        (3, "I", "r2", "a", "c1", "py", "z"),
    ], 0)
    assert v.refresh()["mode"] == "bootstrap"
    assert _view_state(v) == _recompute(t) == {"r1": 2, "r2": 1}

    # unchanged source → noop (safe on a timer / after every micro-batch)
    assert v.refresh()["mode"] == "noop"

    # inserts, an update (no count change) and a full-repo delete
    _merge(t, spark, [
        (4, "U", "r1", "a", "c1", "py", "x2"),
        (5, "I", "r3", "a", "c1", "py", "w"),
        (6, "D", "r2", "a", "c1", None, None),
    ], 1)
    r = v.refresh()
    assert r["mode"] == "incremental"
    # r2 reached zero and retired from the rollup entirely
    assert _view_state(v) == _recompute(t) == {"r1": 2, "r3": 1}
    assert v.last_source_version() == t.current_version()


def test_rollup_view_rebootstraps_past_retention(spark, tmp_path):
    t = mk_table(spark, tmp_path, retain_history=0)
    v = RollupView(
        spark, str(tmp_path / "view"), t,
        group_cols=["repo"], compare_cols=["content"],
    )
    _merge(t, spark, [(1, "I", "r1", "a", "c1", "py", "x")], 0)
    assert v.refresh()["mode"] == "bootstrap"
    # COW shares untouched bucket dirs across versions, so plain merges can
    # leave an old version readable even at retain_history=0 (incremental
    # still works — by design). A rebucket rewrites EVERY bucket and GCs the
    # old dirs, genuinely expiring the view's version: refresh must degrade
    # to a one-off full bootstrap instead of raising.
    _merge(t, spark, [(2, "I", "r1", "b", "c1", "py", "y")], 1)
    _merge(t, spark, [(3, "I", "r2", "a", "c1", "py", "z")], 2)
    t.rebucket(8)
    assert v.refresh()["mode"] == "bootstrap"
    assert _view_state(v) == _recompute(t) == {"r1": 2, "r2": 1}


def test_rollup_view_rides_the_stream(spark, tmp_path):
    """A RollupView attached to the IngestJob stays exactly-once-consistent
    with the table across streaming micro-batches, including a full
    checkpointed redelivery of the drained stream (guard-skipped batches →
    noop refreshes, same aggregate)."""
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, write_event_log

    src = str(tmp_path / "log")
    write_event_log(gen_change_events(spark, 800), src, n_files=8)
    t = mk_table(spark, tmp_path, n_buckets=4, retain_history=8)
    v = RollupView(spark, str(tmp_path / "view"), t, group_cols=["repo"])
    job = (
        IngestJob("rv-stream", max_files_per_trigger=3)
        .source(src)
        .schema(IngestJob.default_payload_schema())
        .sink(t)
        .rollup(v)
        .build()
    )
    ckpt = str(tmp_path / "ckpt")
    job.start_stream(spark, ckpt).awaitTermination()
    assert v.last_source_version() == t.current_version()
    assert _view_state(v) == _recompute(t)
    ver = t.current_version()
    # drain again from the same checkpoint: no new data, no new versions,
    # and the view doesn't move either
    job.start_stream(spark, ckpt).awaitTermination()
    assert t.current_version() == ver and v.last_source_version() == ver


def test_rollup_view_rebuilds_on_group_cols_change(spark, tmp_path):
    """A view directory built for one grouping is never delta-folded (or
    noop-served) under another — a constructor with different group_cols
    rebuilds even at the same source version."""
    t = mk_table(spark, tmp_path, retain_history=8)
    _merge(t, spark, [
        (1, "I", "r1", "a", "c1", "py", "x"),
        (2, "I", "r1", "b", "c2", "py", "y"),
    ], 0)
    v1 = RollupView(spark, str(tmp_path / "view"), t, group_cols=["repo"])
    assert v1.refresh()["mode"] == "bootstrap"
    v2 = RollupView(spark, str(tmp_path / "view"), t, group_cols=["repo", "path"])
    assert v2.refresh()["mode"] == "bootstrap"   # same source version: rebuilt anyway
    got = {(r["repo"], r["path"]): r["n_live"] for r in v2.read().collect()}
    assert got == {("r1", "a"): 1, ("r1", "b"): 1}


def test_rollup_view_rejects_non_key_grouping(spark, tmp_path):
    """Count-delta algebra is unsound for mutable group columns (a 'U' that
    moves a row between groups carries no old-group info) — constructor
    fails loudly instead of drifting silently."""
    import pytest

    from wprdc_etl_spark.exceptions import SinkCommitError

    t = mk_table(spark, tmp_path)
    with pytest.raises(SinkCommitError, match="non-key column"):
        RollupView(spark, str(tmp_path / "view"), t, group_cols=["lang"])
