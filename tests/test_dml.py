"""Row-level DML verbs — delete_where / update_where (Iceberg
``DELETE/UPDATE ... WHERE`` analogs; beyond the reference, whose only
mutation is the upsert row stream — SURVEY §3 Table A21). The verbs
compile predicates to tombstone/update batches through the ordinary
merge, so these tests pin the inherited properties: LWW ordering vs log
stragglers, bucket-pruned rewrite, time travel, changelog visibility."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
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


def seeded(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    t.merge(
        ev(
            spark,
            [
                (10, "I", "r1", "a.py", "c1", "py", "aa"),
                (11, "I", "r1", "b.go", "c1", "go", "bb"),
                (12, "I", "r2", "c.go", "c1", "go", "cc"),
                (13, "I", "r2", "d.py", "c2", "py", "dd"),
            ],
        ),
        job="seed",
        batch_id=0,
    )
    return t


def state(t):
    return {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in t.read().collect()
    }


def test_delete_where_removes_matches_only(spark, tmp_path):
    t = seeded(spark, tmp_path)
    pre = t.current_version()
    res = t.delete_where(F.col("lang") == "go")
    assert res.applied
    assert set(state(t)) == {("r1", "a.py", "c1"), ("r2", "d.py", "c2")}
    # time travel: the pre-delete snapshot still shows every row
    assert t.read(version=pre).count() == 4
    # changelog sees exactly the two deletes
    ch = t.changes_between(pre, compare_cols=["lang"])
    got = {(r["repo"], r["path"], r["change_op"]) for r in ch.collect()}
    assert got == {("r1", "b.go", "D"), ("r2", "c.go", "D")}


def test_delete_tombstone_outranks_log_straggler(spark, tmp_path):
    """A redelivered/late log event with a LOWER sequence must not resurrect
    a DML-deleted key — the tombstone carries max_seq+1 and wins LWW."""
    t = seeded(spark, tmp_path)
    t.delete_where(F.col("path") == "b.go")
    t.merge(
        ev(spark, [(12, "U", "r1", "b.go", "c1", "go", "late")]),
        job="seed",
        batch_id=1,
    )
    assert ("r1", "b.go", "c1") not in state(t)
    # ...but a genuinely NEWER log event (higher sequence) re-inserts it
    t.merge(
        ev(spark, [(99, "I", "r1", "b.go", "c1", "go", "new")]),
        job="seed",
        batch_id=2,
    )
    assert state(t)[("r1", "b.go", "c1")] == ("go", "new")


def test_update_where_applies_expressions(spark, tmp_path):
    t = seeded(spark, tmp_path)
    res = t.update_where(
        F.col("lang") == "go",
        {"lang": F.lit("golang"), "content": F.upper(F.col("content"))},
    )
    assert res.applied
    s = state(t)
    assert s[("r1", "b.go", "c1")] == ("golang", "BB")
    assert s[("r2", "c.go", "c1")] == ("golang", "CC")
    assert s[("r1", "a.py", "c1")] == ("py", "aa")  # untouched


def test_update_where_sql_string_expr_and_ordering(spark, tmp_path):
    t = seeded(spark, tmp_path)
    t.update_where("path = 'a.py'", {"content": "concat(content, '!')"})
    assert state(t)[("r1", "a.py", "c1")] == ("py", "aa!")
    # lower-seq straggler loses to the update; higher-seq event wins over it
    t.merge(ev(spark, [(12, "U", "r1", "a.py", "c1", "py", "old")]), job="seed", batch_id=1)
    assert state(t)[("r1", "a.py", "c1")] == ("py", "aa!")
    t.merge(ev(spark, [(99, "U", "r1", "a.py", "c1", "py", "new")]), job="seed", batch_id=2)
    assert state(t)[("r1", "a.py", "c1")] == ("py", "new")


def test_update_where_rejects_key_and_unknown_columns(spark, tmp_path):
    t = seeded(spark, tmp_path)
    with pytest.raises(SinkCommitError, match="key/bucket"):
        t.update_where(F.lit(True), {"path": F.lit("x")})
    with pytest.raises(SinkCommitError, match="unknown"):
        t.update_where(F.lit(True), {"nope": F.lit("x")})


def test_dml_verbs_chain_with_distinct_batch_ids(spark, tmp_path):
    """Consecutive DML verbs share the __dml__ job and auto-increment its
    batch id — the second must not be swallowed by the exactly-once guard."""
    t = seeded(spark, tmp_path)
    t.delete_where(F.col("path") == "b.go")
    t.update_where(F.col("path") == "c.go", {"lang": F.lit("golang")})
    s = state(t)
    assert ("r1", "b.go", "c1") not in s
    assert s[("r2", "c.go", "c1")][0] == "golang"
    assert t.last_committed_batch("__dml__") == 1


def test_delete_where_no_matches_preserves_state(spark, tmp_path):
    t = seeded(spark, tmp_path)
    before = state(t)
    t.delete_where(F.col("lang") == "rust")
    assert state(t) == before


def test_dml_on_mor_table(spark, tmp_path):
    t = seeded(spark, tmp_path, write_mode="mor")
    t.delete_where(F.col("lang") == "go")
    t.update_where(F.col("path") == "a.py", {"content": F.lit("zz")})
    s = state(t)
    assert set(s) == {("r1", "a.py", "c1"), ("r2", "d.py", "c2")}
    assert s[("r1", "a.py", "c1")] == ("py", "zz")


def test_delete_where_narrow_batch_prunes_payload(spark, tmp_path):
    """The delete batch is keys+op+seq only — payload bytes never enter it.
    Guarded structurally: a delete over a content predicate still merges a
    batch whose schema has every payload column null-cast (merge contract),
    and the final state matches."""
    t = seeded(spark, tmp_path)
    t.delete_where(F.length("content") == 2)  # matches every seeded row
    assert state(t) == {}


def test_iceberg_dml_sql_builders():
    from wprdc_etl_spark.plans.iceberg import (
        delete_where_sql,
        next_seq_sql,
        update_where_sql,
    )

    d = delete_where_sql("cat.db.t", "lang = 'go'", 42)
    # tombstone, not physical delete: a late straggler must still lose LWW
    assert d.startswith("UPDATE cat.db.t SET _op = 'D', _seq = 42")
    assert "(lang = 'go') AND _op <> 'D'" in d
    u = update_where_sql("cat.db.t", {"lang": "'golang'"}, "lang = 'go'", 43)
    assert "SET lang = 'golang', _seq = 43, _op = 'U'" in u
    assert "(lang = 'go') AND _op <> 'D'" in u
    assert next_seq_sql("cat.db.t") == (
        "SELECT coalesce(max(_seq), -1) + 1 AS next_seq FROM cat.db.t"
    )
