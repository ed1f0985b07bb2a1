"""Regression pins for the second round-3 adversarial review (the range
after c778974: multi-writer commits, multi-table publish, MERGE INTO,
generated columns, KMV follower, JoinView, bootstrap, text scoring).

Each test locks one fix:

- KmvRollup requests its own sketch columns from ``changes_between`` — the
  default (content_sha) projection wedged the follower on any standard
  table whose value/group columns aren't merge keys.
- generated columns evaluate in dependency order (fixed point), not
  alphabetical: a column referencing another generated column is computed,
  never silently null-filled.
- JoinView / Scd2Table / bootstrap_snapshot resolve the authoritative merge
  keys from the table manifests instead of trusting handle defaults or a
  hardcoded (repo, path, commit).
- MultiTablePublish intents replay in NUMERIC txid order (commit-10 after
  commit-2, not before).
- the shared ASCII-whitespace class spells vertical tab as \\x0B: Java
  regex reads \\v as the whole vertical-whitespace class (adding U+2028
  etc.), so the engine tokenizer diverged from the Python/RE2 twins on
  non-ASCII line separators.
- IcebergTable.merge_into rejects a condition supplied without its clause,
  same error as the lake verb (drop-in parity).
"""

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import InvalidConfigException, SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from test_lake_merge import SCHEMA, ev


# ---- KmvRollup on a standard (content_sha-bearing) table ---------------------


def test_kmv_rollup_incremental_survives_content_sha_compare_default(
    spark, tmp_path
):
    """A standard table has content_sha, so changes_between's default
    projection carries ONLY keys + content_sha — the follower must request
    its sketch columns explicitly or the first incremental sync dies on a
    missing value_col (here: lang)."""
    from wprdc_etl_spark.operators.kmv import KmvRollup, kmv_sketch

    sha_schema = T.StructType(
        SCHEMA.fields + [T.StructField("content_sha", T.StringType())]
    )
    src = ParquetSnapshotTable(
        spark, str(tmp_path / "src"), n_buckets=4, retain_history=8
    )
    src.ensure(sha_schema)

    def batch(rows):
        return ev(spark, rows).withColumn(
            "content_sha",
            F.when(F.col("op") != "D", F.sha2(F.col("content"), 256)),
        )

    src.merge(
        batch([(1, "I", "r1", "a", "c1", "py", "A"),
               (2, "I", "r1", "b", "c1", "py", "B")]),
        job="j", batch_id=0,
    )
    roll = KmvRollup(
        spark, str(tmp_path / "kmv"), src,
        group_cols=["repo"], value_col="lang", k=8, n_buckets=2,
    )
    assert roll.sync()["mode"] == "bootstrap"
    # lang flips on one row (content changes too): the incremental sync must
    # see the new lang image even though content_sha is the compare default
    src.merge(batch([(10, "U", "r1", "a", "c1", "go", "A2")]),
              job="j", batch_id=1)
    r = roll.sync()
    assert r["mode"] == "incremental" and r["applied"]
    lit = spark.createDataFrame(
        [("r1", "py"), ("r1", "go")], "repo string, lang string"
    )
    want = {
        (row["repo"],): list(row["sketch"])
        for row in kmv_sketch(lit, ["repo"], "lang", k=8).collect()
    }
    got = {(row["repo"],): list(row["sketch"]) for row in roll.read().collect()}
    assert got == want


# ---- generated-column dependency order ---------------------------------------


def test_generated_column_may_reference_earlier_generated_column(spark, tmp_path):
    """'a_twice' references 'b_len' and sorts BEFORE it alphabetically — a
    single sorted sweep null-filled it silently; the fixed-point pass
    computes both."""
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=2)
    t.ensure(SCHEMA)
    t.add_generated_column("b_len", "length(content)")
    t.merge(ev(spark, [(0, "I", "r1", "a.py", "c1", "py", "hello")]),
            job="j", batch_id=0)
    t.add_generated_column("a_twice", "b_len * 2")
    t.merge(ev(spark, [(1, "I", "r1", "b.py", "c1", "py", "xyz")]),
            job="j", batch_id=1)
    got = {
        r["path"]: (r["b_len"], r["a_twice"]) for r in t.read().collect()
    }
    assert got["b.py"] == (3, 6)  # both generated, dependency respected
    assert got["a.py"][0] == 5  # pre-existing row null-fills only the new col


# ---- followers resolve keys from the manifest --------------------------------

DIM_SCHEMA = T.StructType(
    [T.StructField("lang", T.StringType()), T.StructField("family", T.StringType())]
)


def _custom_keyed_pair(spark, tmp):
    """fact keyed by path, dim keyed by lang — both via explicit handles."""
    fact = ParquetSnapshotTable(
        spark, str(tmp / "fact"), keys=["path"], bucket_keys=["path"],
        n_buckets=2, retain_history=4,
    )
    fact.ensure(SCHEMA)
    fact.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r1", "b", "c1", "go", "B")]),
        job="j", batch_id=0,
    )
    dim = ParquetSnapshotTable(
        spark, str(tmp / "dim"), keys=["lang"], bucket_keys=["lang"],
        n_buckets=2, retain_history=4,
    )
    dim.ensure(DIM_SCHEMA)
    dim.merge(
        spark.createDataFrame(
            [(0, "I", "py", "script")],
            "event_sequence long, op string, lang string, family string",
        ),
        job="dim", batch_id=0,
    )
    return fact, dim


def test_joinview_from_default_handles_resolves_manifest_keys(spark, tmp_path):
    from wprdc_etl_spark.plans.joinview import JoinView

    _custom_keyed_pair(spark, tmp_path)
    # reopen both through DEFAULT handles (the CLI shape: no keys passed)
    fact_h = ParquetSnapshotTable(spark, str(tmp_path / "fact"))
    dim_h = ParquetSnapshotTable(spark, str(tmp_path / "dim"))
    view = JoinView(
        spark, str(tmp_path / "view"), fact_h, dim_h,
        on={"lang": "lang"}, n_buckets=2,
    )
    assert view.table.keys == ["path"]  # fact's true keys, not the defaults
    r = view.sync()
    assert r["mode"] == "bootstrap" and r["applied"]
    got = {r["path"]: r["family"] for r in view.read().collect()}
    assert got == {"a": "script", "b": None}


def test_scd2_from_default_handle_derives_layout_from_manifest(spark, tmp_path):
    from wprdc_etl_spark.plans.scd2 import Scd2Table

    _custom_keyed_pair(spark, tmp_path)
    dim_h = ParquetSnapshotTable(spark, str(tmp_path / "dim"))
    hist = Scd2Table(spark, str(tmp_path / "hist"), dim_h, n_buckets=2)
    assert hist.table.keys == ["lang", "valid_from_v"]
    r = hist.sync()
    assert r["mode"] == "bootstrap" and r["applied"]
    rows = hist.current().collect()
    assert {x["lang"] for x in rows} == {"py"}


def test_bootstrap_validates_sink_keys_not_hardcoded(spark, tmp_path, monkeypatch):
    from wprdc_etl_spark.streaming.job import IngestJob

    table = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"), keys=["lang"], bucket_keys=["lang"],
        n_buckets=2,
    )
    job = (
        IngestJob("ck")
        .source(str(tmp_path / "log"))
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    seen = {}
    monkeypatch.setattr(job, "apply_batch", lambda df, bid: seen.setdefault("bid", bid))
    monkeypatch.setattr(table, "ensure", lambda schema: None)
    # carries the sink's real key (lang) but NOT repo/path/commit: accepted
    job.bootstrap_snapshot(
        spark.createDataFrame([("py",)], "lang string"), as_of_seq=5
    )
    assert seen["bid"] == -1
    # carries the defaults but NOT the sink's custom key: rejected, by name
    with pytest.raises(InvalidConfigException, match="lang"):
        job.bootstrap_snapshot(
            spark.createDataFrame(
                [("r", "p", "c")], "repo string, path string, commit string"
            ),
            as_of_seq=5,
        )


# ---- multi-table intents replay in numeric txid order ------------------------


def test_intents_replay_in_numeric_txid_order(tmp_path):
    from wprdc_etl_spark.plans.txn_commit import MultiTablePublish

    co = MultiTablePublish(str(tmp_path / "co"))
    for txid in (2, 10, 1):
        with open(os.path.join(co.dir, f"commit-{txid}.json"), "w") as fh:
            json.dump({"txid": txid, "tables": {}}, fh)
    assert [p["txid"] for p in co.pending()] == [1, 2, 10]


# ---- vertical tab class: Java \v != Python/RE2 \v ---------------------------


def test_unigram_tokens_match_duckdb_twin_on_unicode_line_separator(
    spark, tmp_path
):
    """U+2028 is vertical whitespace to Java's \\v but an ordinary char to
    Python re and RE2 — the shared class must treat it identically (one
    token) in the engine and the oracle."""
    from wprdc_etl_spark.functions.text import unigram_logprob, unigram_logprob_sql

    rows = [(1, "a\u2028b c"), (2, "plain text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pdir = str(tmp_path / "docs.parquet")
    df.write.parquet(pdir)
    got = {
        (r["doc_id"], r["n_tokens"], r["lm_score"])
        for r in unigram_logprob(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW docs AS SELECT * FROM read_parquet('{pdir}/*.parquet')"
    )
    want = {
        (d, int(n), float(s))
        for d, s, n in con.execute(unigram_logprob_sql("docs")).fetchall()
    }
    con.close()
    assert got == want
    # and the U+2028 doc really is 2 tokens ('a b', 'c'), not 3
    assert next(x for x in got if x[0] == 1)[1] == 2


# ---- Iceberg merge_into clause validation (drop-in parity) -------------------


def test_iceberg_merge_into_rejects_condition_without_clause(spark):
    from wprdc_etl_spark.plans.iceberg import IcebergTable

    t = IcebergTable.__new__(IcebergTable)  # bypass the runtime gate: the
    t.spark = spark                         # validation runs before any
    t.table = "nosuch"                      # catalog access
    t.keys = ["repo", "path", "commit"]
    src = spark.createDataFrame([("r", "p", "c")],
                                "repo string, path string, commit string")
    with pytest.raises(SinkCommitError, match="update_condition"):
        t.merge_into(src, update_condition="s.lang = 'py'")
    with pytest.raises(SinkCommitError, match="delete_condition"):
        t.merge_into(src, when_matched_update="all",
                     delete_condition="t.lang = 'py'")
    with pytest.raises(SinkCommitError, match="insert_condition"):
        t.merge_into(src, when_matched_delete=True,
                     insert_condition="s.lang = 'py'")
