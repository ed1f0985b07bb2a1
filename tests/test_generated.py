"""Generated columns (Delta ``GENERATED ALWAYS AS`` analog) — a persisted
table property ``generated`` mapping column → SQL expression. Every merge
batch computes the column when ABSENT (the normal CDC feed never carries
it) and equality-asserts it when PRESENT (a producer that materializes the
column must agree with the definition — Delta's write-time check), riding
the same event_sequence expression as CHECK constraints (zero extra
actions, atomic rejection). 'D' tombstones are exempt (their payload is
null by contract)."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from tests.test_dml import EV_SCHEMA, SCHEMA, ev  # reuse helpers


def mk(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    return t


def test_generated_column_computed_when_absent(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.add_generated_column("content_len", "length(content)")
    t.merge(
        ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "hello"),
                   (1, "I", "r1", "b.py", "c1", "py", "xy")]),
        job="j", batch_id=0,
    )
    got = {r["path"]: r["content_len"] for r in t.read().collect()}
    assert got == {"a.py": 5, "b.py": 2}
    # the column entered the schema via ordinary additive evolution
    assert "content_len" in t.read().columns


def test_generated_column_verified_when_present(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.add_generated_column("content_len", "length(content)")
    t.merge(ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "hello")]), job="j", batch_id=0)
    # a producer carrying a CORRECT value passes
    good = ev(spark, [(1, "U", "r1", "a.py", "c1", "py", "abc")]).withColumn(
        "content_len", F.lit(3)
    )
    t.merge(good, job="j", batch_id=1)
    # an INCONSISTENT value is rejected atomically, nothing committed
    bad = ev(spark, [(2, "U", "r1", "a.py", "c1", "py", "abcd")]).withColumn(
        "content_len", F.lit(99)
    )
    pre = t.current_version()
    with pytest.raises(SinkCommitError, match="generated column"):
        t.merge(bad, job="j", batch_id=2)
    assert t.current_version() == pre
    got = {r["path"]: (r["content"], r["content_len"]) for r in t.read().collect()}
    assert got == {"a.py": ("abc", 3)}
    # the guarded batch id was NOT consumed: the corrected retry lands
    fixed = ev(spark, [(2, "U", "r1", "a.py", "c1", "py", "abcd")])
    t.merge(fixed, job="j", batch_id=2)
    assert {r["content_len"] for r in t.read().collect()} == {4}


def test_generated_tombstones_exempt_and_dml_composes(spark, tmp_path):
    t = mk(spark, tmp_path)
    t.add_generated_column("content_len", "length(content)")
    t.merge(
        ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "hello"),
                   (1, "I", "r2", "b.go", "c1", "go", "worldly")]),
        job="j", batch_id=0,
    )
    # delete batch is keys-only (null payload): generated col must not block
    t.delete_where(F.col("lang") == "go")
    assert {r["path"] for r in t.read().collect()} == {"a.py"}
    # update_where recomputes: the batch carries content_len and the update
    # rewrites content — RHS sees the OLD row, so the carried value would go
    # stale; the generated definition wins (recomputed from the new image)
    t.update_where(F.col("path") == "a.py", {"content": F.lit("zz!")})
    row = t.read().collect()[0]
    assert (row["content"], row["content_len"]) == ("zz!", 3)


def test_add_generated_column_validation(spark, tmp_path):
    t = mk(spark, tmp_path)
    with pytest.raises(SinkCommitError, match="key/bucket"):
        t.add_generated_column("path", "upper(path)")
    with pytest.raises(SinkCommitError, match="does not analyze"):
        t.add_generated_column("x", "nope(content)")
    t.add_generated_column("content_len", "length(content)")
    with pytest.raises(SinkCommitError, match="already"):
        t.add_generated_column("content_len", "length(content)")
    # property persists: a fresh handle enforces it
    t2 = ParquetSnapshotTable(spark, t.root)
    t2.merge(ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "four")]), job="j", batch_id=0)
    assert t2.read().collect()[0]["content_len"] == 4
    t2.drop_generated_column("content_len")
    with pytest.raises(SinkCommitError, match="does not exist"):
        t2.drop_generated_column("content_len")


def test_generated_existing_rows_backfilled_at_add(spark, tmp_path):
    """Adding a generated column to a NON-EMPTY table backfills existing
    rows in one rewrite commit (Delta requires the column at table create;
    the engine generalizes via its compact machinery)."""
    t = mk(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "hello")]), job="j", batch_id=0)
    t.add_generated_column("content_len", "length(content)")
    got = t.read().collect()[0]
    assert got["content_len"] == 5
    # later merges keep computing it
    t.merge(ev(spark, [(1, "I", "r2", "b.py", "c1", "py", "xy")]), job="j", batch_id=1)
    got = {r["path"]: r["content_len"] for r in t.read().collect()}
    assert got == {"a.py": 5, "b.py": 2}


def test_generated_skipped_when_source_columns_absent(spark, tmp_path):
    """A batch lacking the expression's source columns (narrow DML
    tombstones, schema-evolution null-fill) merges under the ordinary
    null-fill contract — the generated value is null for those writers,
    exactly like any absent column."""
    t = mk(spark, tmp_path)
    t.add_generated_column("content_len", "length(content)")
    t.merge(ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "hello")]), job="j", batch_id=0)
    narrow = spark.createDataFrame(
        [(1, "U", "r1", "a.py", "c1")],
        "event_sequence long, op string, repo string, path string, commit string",
    )
    t.merge(narrow, job="j", batch_id=1)
    row = t.read().collect()[0]
    assert row["content"] is None and row["content_len"] is None
