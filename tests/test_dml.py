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


# ---- merge_into (generic multi-clause MERGE; Delta/Iceberg MERGE INTO) ----

SRC_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def src(spark, rows, schema=SRC_SCHEMA):
    return spark.createDataFrame(rows, schema)


def test_merge_into_upsert_all(spark, tmp_path):
    """update='all' + insert='all': matched rows take source values,
    unmatched source rows insert, untouched table rows survive."""
    t = seeded(spark, tmp_path)
    res = t.merge_into(
        src(
            spark,
            [
                ("r1", "a.py", "c1", "py3", "AA"),   # matched -> update
                ("r9", "new.rs", "c9", "rs", "nn"),  # unmatched -> insert
            ],
        ),
        when_matched_update="all",
        when_not_matched_insert="all",
    )
    assert res.applied
    s = state(t)
    assert s[("r1", "a.py", "c1")] == ("py3", "AA")
    assert s[("r9", "new.rs", "c9")] == ("rs", "nn")
    assert s[("r1", "b.go", "c1")] == ("go", "bb")  # untouched
    assert len(s) == 5


def test_merge_into_delete_claims_before_update(spark, tmp_path):
    """Fixed clause order: a matched row satisfying the delete condition is
    tombstoned and never seen by the update clause."""
    t = seeded(spark, tmp_path)
    t.merge_into(
        src(spark, [("r1", "b.go", "c1", None, None), ("r2", "c.go", "c1", None, None)]),
        when_matched_delete=True,
        delete_condition="t.path = 'b.go'",
        when_matched_update={"content": "upper(t.content)"},
    )
    s = state(t)
    assert ("r1", "b.go", "c1") not in s          # deleted
    assert s[("r2", "c.go", "c1")] == ("go", "CC")  # updated, not deleted
    assert len(s) == 3


def test_merge_into_conditions_and_mixed_sides(spark, tmp_path):
    """update/insert conditions filter their clause; update exprs see both
    sides (s. and t.)."""
    t = seeded(spark, tmp_path)
    t.merge_into(
        src(
            spark,
            [
                ("r1", "a.py", "c1", "PY", "xx"),    # matched, lang!=go -> no update
                ("r1", "b.go", "c1", "GO", "yy"),    # matched, go -> update
                ("r8", "skip.c", "c8", "c", "zz"),   # unmatched, lang='c' -> filtered out
                ("r8", "keep.h", "c8", "h", "hh"),   # unmatched -> inserted
            ],
        ),
        when_matched_update={"content": "concat(t.content, '+', s.content)"},
        update_condition="t.lang = 'go'",
        when_not_matched_insert="all",
        insert_condition="s.lang <> 'c'",
    )
    s = state(t)
    assert s[("r1", "a.py", "c1")] == ("py", "aa")       # condition false
    assert s[("r1", "b.go", "c1")] == ("go", "bb+yy")    # both sides in expr
    assert ("r8", "skip.c", "c8") not in s
    assert s[("r8", "keep.h", "c8")] == ("h", "hh")      # 'all' takes lang from s
    assert len(s) == 5


def test_merge_into_insert_only_ignores_matches(spark, tmp_path):
    t = seeded(spark, tmp_path)
    t.merge_into(
        src(spark, [("r1", "a.py", "c1", "XX", "XX"), ("r7", "n.py", "c7", "py", "nn")]),
        when_not_matched_insert="all",
    )
    s = state(t)
    assert s[("r1", "a.py", "c1")] == ("py", "aa")  # matched row untouched
    assert s[("r7", "n.py", "c7")] == ("py", "nn")


def test_merge_into_update_all_carries_absent_columns(spark, tmp_path):
    """'all' with a source missing a table column: that column keeps the
    TARGET value on update (and null-fills on insert)."""
    t = seeded(spark, tmp_path)
    narrow = T.StructType([T.StructField(c, T.StringType()) for c in
                           ["repo", "path", "commit", "content"]])
    t.merge_into(
        src(spark, [("r1", "a.py", "c1", "NEW"), ("r6", "f.py", "c6", "ff")], narrow),
        when_matched_update="all",
        when_not_matched_insert="all",
    )
    s = state(t)
    assert s[("r1", "a.py", "c1")] == ("py", "NEW")   # lang carried from target
    assert s[("r6", "f.py", "c6")] == (None, "ff")    # lang null on insert


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    t = seeded(spark, tmp_path)
    pre = t.current_version()
    with pytest.raises(SinkCommitError, match="multiple rows"):
        t.merge_into(
            src(spark, [("r7", "x.py", "c7", "py", "v1"), ("r7", "x.py", "c7", "py", "v2")]),
            when_not_matched_insert="all",
        )
    assert t.current_version() == pre  # nothing committed
    assert len(state(t)) == 4


def test_merge_into_validation_errors(spark, tmp_path):
    t = seeded(spark, tmp_path)
    with pytest.raises(SinkCommitError, match="at least one clause"):
        t.merge_into(src(spark, []))
    with pytest.raises(SinkCommitError, match="without its clause"):
        t.merge_into(src(spark, []), when_matched_update="all",
                     insert_condition="true")
    with pytest.raises(SinkCommitError, match="key/bucket"):
        t.merge_into(src(spark, []), when_matched_update={"path": "s.path"})
    with pytest.raises(SinkCommitError, match="unknown columns"):
        t.merge_into(src(spark, []), when_matched_update={"nope": "s.path"})
    with pytest.raises(SinkCommitError, match="missing key columns"):
        t.merge_into(
            spark.createDataFrame([("r1",)], "repo string"),
            when_matched_update="all",
        )


def test_merge_into_lww_vs_log_straggler(spark, tmp_path):
    """merge_into rows enter the log's total order one past the committed
    max — a lower-sequence log straggler must not override them."""
    t = seeded(spark, tmp_path)
    t.merge_into(
        src(spark, [("r1", "a.py", "c1", "py", "merged")]),
        when_matched_update="all",
    )
    t.merge(ev(spark, [(12, "U", "r1", "a.py", "c1", "py", "late")]),
            job="seed", batch_id=1)
    assert state(t)[("r1", "a.py", "c1")] == ("py", "merged")
    t.merge(ev(spark, [(99, "U", "r1", "a.py", "c1", "py", "newer")]),
            job="seed", batch_id=2)
    assert state(t)[("r1", "a.py", "c1")] == ("py", "newer")


def test_merge_into_respects_check_constraints(spark, tmp_path):
    """The generic merge compiles onto the guarded CDC merge, so persisted
    CHECK constraints veto a violating update atomically."""
    t = seeded(spark, tmp_path)
    t.add_constraint("content_nonempty", "length(content) > 0")
    with pytest.raises(SinkCommitError, match="content_nonempty"):
        t.merge_into(
            src(spark, [("r1", "a.py", "c1", "py", "")]),
            when_matched_update="all",
        )
    assert state(t)[("r1", "a.py", "c1")] == ("py", "aa")


def test_merge_into_on_mor_table_and_time_travel(spark, tmp_path):
    t = seeded(spark, tmp_path, write_mode="mor")
    pre = t.current_version()
    t.merge_into(
        src(spark, [("r1", "b.go", "c1", None, None), ("r5", "e.py", "c5", "py", "ee")]),
        when_matched_delete=True,
        when_not_matched_insert="all",
    )
    s = state(t)
    assert ("r1", "b.go", "c1") not in s
    assert s[("r5", "e.py", "c5")] == ("py", "ee")
    assert t.read(version=pre).count() == 4
