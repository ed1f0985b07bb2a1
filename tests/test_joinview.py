"""JoinView (plans/joinview.py) — incrementally-maintained fact⟕dim view:
the two-sided delta algebra vs a full recompute, exactly-once cursor pair,
join-column moves, left-join NULL flips, retention repair, and riding
IngestJob.follow."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.joinview import JoinView
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from test_lake_merge import SCHEMA, ev  # noqa: E402

DIM_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("family", T.StringType()),
        T.StructField("tier", T.LongType()),
    ]
)


def _fact(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("retain_history", 8)
    t = ParquetSnapshotTable(spark, str(tmp / "fact"), **kw)
    t.ensure(SCHEMA)
    return t


def _dim(spark, tmp, rows, batch_id=0, **kw):
    kw.setdefault("n_buckets", 2)
    kw.setdefault("retain_history", 8)
    t = ParquetSnapshotTable(
        spark, str(tmp / "dim"), keys=["lang"], bucket_keys=["lang"], **kw
    )
    t.ensure(DIM_SCHEMA)
    if rows:
        t.merge(_dim_batch(spark, rows), job="dim", batch_id=batch_id)
    return t


def _dim_batch(spark, rows):
    """rows: (seq, op, lang, family, tier)"""
    sch = T.StructType(
        [
            T.StructField("event_sequence", T.LongType()),
            T.StructField("op", T.StringType()),
        ]
        + DIM_SCHEMA.fields
    )
    return spark.createDataFrame(rows, sch)


def _view(spark, tmp, fact, dim, **kw):
    kw.setdefault("on", {"lang": "lang"})
    kw.setdefault("n_buckets", 4)
    return JoinView(spark, str(tmp / "view"), fact, dim, **kw)


def _rows(df):
    return {
        (r["repo"], r["path"], r["commit"]): (
            r["lang"], r["content"], r["family"], r["tier"]
        )
        for r in df.collect()
    }


def _recompute(fact, dim):
    f, d = fact.read(), dim.read()
    return _rows(f.join(d, "lang", "left").select(
        "repo", "path", "commit", "lang", "content", "family", "tier"
    ))


def test_bootstrap_is_full_left_join_with_null_for_unmatched(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    fact.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r1", "b", "c1", "zz", "B")]),  # zz: no dim row
        job="j", batch_id=0,
    )
    dim = _dim(spark, tmp_path, [(0, "I", "py", "script", 1)])
    view = _view(spark, tmp_path, fact, dim)
    r = view.sync()
    assert r["mode"] == "bootstrap" and r["applied"]
    got = _rows(view.read())
    assert got[("r1", "a", "c1")] == ("py", "A", "script", 1)
    assert got[("r1", "b", "c1")] == ("zz", "B", None, None)
    assert got == _recompute(fact, dim)


def test_fact_side_incremental_insert_update_delete(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    fact.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r1", "b", "c1", "go", "B")]),
        job="j", batch_id=0,
    )
    dim = _dim(spark, tmp_path,
               [(0, "I", "py", "script", 1), (1, "I", "go", "compiled", 2)])
    view = _view(spark, tmp_path, fact, dim)
    view.sync()
    fact.merge(
        ev(spark, [(10, "U", "r1", "a", "c1", "py", "A2"),
                   (11, "D", "r1", "b", "c1", None, None),
                   (12, "I", "r2", "x", "c1", "go", "X")]),
        job="j", batch_id=1,
    )
    r = view.sync()
    assert r["mode"] == "incremental" and r["applied"]
    got = _rows(view.read())
    assert got == _recompute(fact, dim)
    assert ("r1", "b", "c1") not in got
    assert got[("r2", "x", "c1")] == ("go", "X", "compiled", 2)


def test_dim_side_incremental_update_insert_delete_fanout(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    fact.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r1", "b", "c1", "go", "B"),
                   (3, "I", "r2", "c", "c1", "rs", "C")]),  # rs: not in dim yet
        job="j", batch_id=0,
    )
    dim = _dim(spark, tmp_path,
               [(0, "I", "py", "script", 1), (1, "I", "go", "compiled", 2)])
    view = _view(spark, tmp_path, fact, dim)
    view.sync()
    # dim update (py attrs), dim insert (rs — flips the NULLs), dim delete
    # (go — flips back to NULL); the fact table does not move at all
    dim.merge(
        _dim_batch(spark, [(10, "U", "py", "script", 7),
                           (11, "I", "rs", "systems", 3),
                           (12, "D", "go", None, None)]),
        job="dim", batch_id=1,
    )
    r = view.sync()
    assert r["mode"] == "incremental" and r["applied"]
    got = _rows(view.read())
    assert got[("r1", "a", "c1")] == ("py", "A", "script", 7)
    assert got[("r1", "b", "c1")] == ("go", "B", None, None)
    assert got[("r2", "c", "c1")] == ("rs", "C", "systems", 3)
    assert got == _recompute(fact, dim)


def test_both_sides_change_in_one_sync_including_overlap(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    fact.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r1", "b", "c1", "go", "B")]),
        job="j", batch_id=0,
    )
    dim = _dim(spark, tmp_path,
               [(0, "I", "py", "script", 1), (1, "I", "go", "compiled", 2)])
    view = _view(spark, tmp_path, fact, dim)
    view.sync()
    # overlap: row (r1,a) is updated on the fact side AND its dim row
    # changes in the same window; (r1,b) is deleted while its dim updates
    fact.merge(
        ev(spark, [(10, "U", "r1", "a", "c1", "py", "A2"),
                   (11, "D", "r1", "b", "c1", None, None)]),
        job="j", batch_id=1,
    )
    dim.merge(
        _dim_batch(spark, [(10, "U", "py", "scripting", 9),
                           (11, "U", "go", "golang", 8)]),
        job="dim", batch_id=1,
    )
    r = view.sync()
    assert r["mode"] == "incremental"
    got = _rows(view.read())
    assert got == _recompute(fact, dim)
    assert got[("r1", "a", "c1")] == ("py", "A2", "scripting", 9)
    assert ("r1", "b", "c1") not in got


def test_join_column_move_is_detected_without_content_change(spark, tmp_path):
    """A fact 'U' that only moves the row to another dim key (content — and
    so any content fingerprint — unchanged) must still re-join: the default
    fact compare includes mutable join columns."""
    fact = _fact(spark, tmp_path)
    fact.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]),
               job="j", batch_id=0)
    dim = _dim(spark, tmp_path,
               [(0, "I", "py", "script", 1), (1, "I", "go", "compiled", 2)])
    view = _view(spark, tmp_path, fact, dim)
    view.sync()
    fact.merge(ev(spark, [(10, "U", "r1", "a", "c1", "go", "A")]),
               job="j", batch_id=1)
    r = view.sync()
    assert r["mode"] == "incremental"
    assert _rows(view.read())[("r1", "a", "c1")] == ("go", "A", "compiled", 2)


def test_sync_is_exactly_once_and_noop_when_caught_up(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    fact.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]),
               job="j", batch_id=0)
    dim = _dim(spark, tmp_path, [(0, "I", "py", "script", 1)])
    view = _view(spark, tmp_path, fact, dim)
    r1 = view.sync()
    assert r1["applied"] and view.cursor() == (
        fact.published_version(), dim.published_version()
    )
    before = _rows(view.read())
    again = view.sync()
    assert again["mode"] == "noop" and not again["applied"]
    assert _rows(view.read()) == before


def test_repair_after_fact_retention_expired_cursor(spark, tmp_path):
    fact = _fact(spark, tmp_path, retain_history=0)
    fact.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]),
               job="j", batch_id=0)
    dim = _dim(spark, tmp_path, [(0, "I", "py", "script", 1)])
    view = _view(spark, tmp_path, fact, dim)
    view.sync()
    # two commits between syncs: the cursor's version data is GC'd under
    # retain_history=0, changes_between raises, sync falls back to repair
    fact.merge(ev(spark, [(10, "U", "r1", "a", "c1", "py", "A2")]),
               job="j", batch_id=1)
    fact.merge(ev(spark, [(20, "I", "r2", "x", "c1", "py", "X")]),
               job="j", batch_id=2)
    r = view.sync()
    assert r["mode"] == "repair" and r["applied"]
    assert _rows(view.read()) == _recompute(fact, dim)


def test_untouched_rows_stay_bit_identical_across_dim_fanout(spark, tmp_path):
    """A dim change for 'go' must not rewrite rows joined to 'py' — checked
    through the view's own changelog: the sync version's delta contains no
    py-keyed rows."""
    fact = _fact(spark, tmp_path)
    fact.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r2", "x", "c1", "go", "X")]),
        job="j", batch_id=0,
    )
    dim = _dim(spark, tmp_path,
               [(0, "I", "py", "script", 1), (1, "I", "go", "compiled", 2)])
    view = _view(spark, tmp_path, fact, dim, retain_history=4)
    view.sync()
    v_before = view.table.current_version()
    dim.merge(_dim_batch(spark, [(10, "U", "go", "golang", 9)]),
              job="dim", batch_id=1)
    view.sync()
    delta = view.table.changes_between(v_before, view.table.current_version())
    touched = {r["repo"] for r in delta.select("repo").distinct().collect()}
    assert touched == {"r2"}
    assert _rows(view.read()) == _recompute(fact, dim)


def test_rides_ingest_job_follow(spark, tmp_path):
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, write_event_log

    log = str(tmp_path / "log")
    write_event_log(gen_change_events(spark, 600), log, n_files=4)
    table = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"), n_buckets=8, retain_history=8
    )
    dim = _dim(spark, tmp_path, [
        (0, "I", "py", "script", 1), (1, "I", "go", "compiled", 2),
        (2, "I", "rs", "systems", 3), (3, "I", "js", "script", 4),
    ])
    view = JoinView(
        spark, str(tmp_path / "view"), table, dim,
        on={"lang": "lang"}, n_buckets=4,
    )
    job = (
        IngestJob("jv-follow")
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .follow(view)
        .build()
    )
    job.run_batch(spark, n_chunks=2)
    assert view.cursor() == (table.published_version(), dim.published_version())
    exp = table.read().join(dim.read(), "lang", "left")
    cols = sorted(exp.columns)
    assert sorted(
        tuple(r) for r in view.read().select(*cols).collect()
    ) == sorted(tuple(r) for r in exp.select(*cols).collect())


def test_validation_errors(spark, tmp_path):
    fact = _fact(spark, tmp_path)
    dim = _dim(spark, tmp_path, [(0, "I", "py", "script", 1)])
    with pytest.raises(SinkCommitError, match="merge keys"):
        JoinView(spark, str(tmp_path / "v1"), fact, dim, on={"lang": "family"})
    fact.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]),
               job="j", batch_id=0)
    # dim payload column colliding with a fact column
    dim2 = ParquetSnapshotTable(
        spark, str(tmp_path / "dim2"), keys=["lang"], bucket_keys=["lang"],
        n_buckets=2,
    )
    dim2.ensure(T.StructType([
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),  # collides
    ]))
    dim2.merge(
        spark.createDataFrame(
            [(0, "I", "py", "D")],
            "event_sequence long, op string, lang string, content string",
        ),
        job="dim", batch_id=0,
    )
    v = JoinView(spark, str(tmp_path / "v2"), fact, dim2, on={"lang": "lang"})
    with pytest.raises(SinkCommitError, match="collide"):
        v.sync()
