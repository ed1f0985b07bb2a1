"""CHECK constraints (plans/lake.py constraints section — Delta ADD
CONSTRAINT analog): persisted-property enforcement at merge with SQL CHECK
NULL semantics, atomicity on violation, and the add-time existing-row scan."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from test_lake_merge import SCHEMA, ev  # noqa: E402


def _tbl(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    return t


def test_violating_merge_fails_cleanly_and_commits_nothing(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.add_constraint("commit_hex", "commit rlike '^[0-9a-f]{2,}$'")
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1f2", "py", "A")]), job="j", batch_id=0)
    v = t.current_version()
    with pytest.raises(SinkCommitError, match="commit_hex"):
        t.merge(
            ev(spark, [(2, "I", "r1", "b", "c2ab", "py", "B"),
                       (3, "I", "r1", "c", "BAD!", "py", "C")]),
            job="j", batch_id=1,
        )
    # atomic: the whole batch is rejected — including its valid rows — and
    # the version chain never advanced
    assert t.current_version() == v
    assert {r["path"] for r in t.read().collect()} == {"a"}
    # the guard did NOT consume the failed batch id: a corrected retry lands
    t.merge(ev(spark, [(2, "I", "r1", "b", "c2ab", "py", "B")]), job="j", batch_id=1)
    assert {r["path"] for r in t.read().collect()} == {"a", "b"}


def test_constraint_is_a_table_property_enforced_by_fresh_handles(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.add_constraint("content_nonempty", "length(content) > 0")
    h = ParquetSnapshotTable(spark, t.root)  # CLI-shaped reopen
    assert h.constraints() == {"content_nonempty": "length(content) > 0"}
    with pytest.raises(SinkCommitError, match="content_nonempty"):
        h.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "")]), job="j", batch_id=0)


def test_null_satisfies_check_and_deletes_are_exempt(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.add_constraint("lang_known", "lang IN ('py', 'go')")
    # SQL CHECK: NULL lang is unknown, not false — passes
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1", None, "A")]), job="j", batch_id=0)
    # a 'D' tombstone carries null payload by contract — exempt even though
    # the check column is present (and null) on the row
    t.merge(ev(spark, [(2, "D", "r1", "a", "c1", None, None)]), job="j", batch_id=1)
    assert t.read().count() == 0


def test_constraint_on_column_absent_from_batch_is_skipped(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.add_constraint("content_nonempty", "length(content) > 0")
    # batch omits content entirely: new rows null-fill (NULL passes CHECK),
    # so the constraint is skipped rather than failing analysis
    batch = spark.createDataFrame(
        [(1, "I", "r1", "a", "c1", "py")],
        "event_sequence long, op string, repo string, path string, "
        "commit string, lang string",
    )
    r = t.merge(batch, job="j", batch_id=0)
    assert r.applied
    assert t.read().where(F.col("content").isNull()).count() == 1


def test_add_constraint_scans_existing_rows_and_rejects(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", ""),
                       (2, "I", "r1", "b", "c1", "py", "B")]), job="j", batch_id=0)
    with pytest.raises(SinkCommitError, match="1 existing row"):
        t.add_constraint("content_nonempty", "length(content) > 0")
    assert t.constraints() == {}  # nothing persisted
    # unanalyzable expression rejected up front
    with pytest.raises(SinkCommitError, match="does not analyze"):
        t.add_constraint("bad", "no_such_column > 0")
    # duplicate name rejected
    t.add_constraint("c1", "TRUE")
    with pytest.raises(SinkCommitError, match="already exists"):
        t.add_constraint("c1", "FALSE")


def test_drop_constraint_lifts_enforcement(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.add_constraint("lang_known", "lang IN ('py')")
    with pytest.raises(SinkCommitError):
        t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "zz", "A")]), job="j", batch_id=0)
    t.drop_constraint("lang_known")
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "zz", "A")]), job="j", batch_id=0)
    assert t.read().count() == 1
    with pytest.raises(SinkCommitError, match="does not exist"):
        t.drop_constraint("lang_known")


def test_dml_update_is_constraint_checked(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]), job="j", batch_id=0)
    t.add_constraint("content_nonempty", "length(content) > 0")
    with pytest.raises(SinkCommitError, match="content_nonempty"):
        t.update_where(F.col("repo") == "r1", {"content": F.lit("")})
    # the blocked DML left the row intact
    assert t.read().collect()[0]["content"] == "A"
    # delete_where builds key-only 'D' tombstones — never checked
    t.delete_where(F.col("repo") == "r1")
    assert t.read().count() == 0


def test_replayed_duplicate_batch_skips_before_checks(spark, tmp_path):
    """A guard-skipped redelivery returns applied=False without evaluating
    constraints — even if the redelivered frame would violate them."""
    t = _tbl(spark, tmp_path)
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]), job="j", batch_id=0)
    t.add_constraint("content_nonempty", "length(content) > 0")
    r = t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "")]), job="j", batch_id=0)
    assert not r.applied
