"""Deterministic sampling / splitting (functions/sampling.py) and the
chunking + redaction text ops — incl. bit-parity of every sha2-leaf SQL twin
against DuckDB (the same in-test oracle pattern as the MinHash twins)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.functions.sampling import (
    SCALE,
    hash_sample,
    slot_sql,
    split_sql,
    stratified_sample,
    with_split,
)
from wprdc_etl_spark.functions.text import (
    chunk_documents,
    chunk_sql,
    redact_pii,
    redact_pii_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"word{i} " * (i % 7 + 1), ["en", "de", "fr", "zz"][i % 4], f"src{i % 10}")
        for i in range(400)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


# ---- sampling --------------------------------------------------------------


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, 0.3, ["doc_id"]).collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), 0.3, ["doc_id"]).collect()
    )
    assert a == b and 0 < len(a) < 400


def test_hash_sample_rate_close(docs):
    n = hash_sample(docs, 0.3, ["doc_id"]).count()
    assert abs(n / 400 - 0.3) < 0.08


def test_hash_sample_group_atomicity(docs):
    """Sampling by source keeps or drops WHOLE sources (the leakage unit)."""
    kept = hash_sample(docs, 0.5, ["source"])
    per_src = {r["source"]: r["n"] for r in
               kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n == 40 for n in per_src.values())  # 400 rows / 10 sources


def test_hash_sample_fraction_bounds(docs):
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5, ["doc_id"])
    assert hash_sample(docs, 0.0, ["doc_id"]).count() == 0
    assert hash_sample(docs, 1.0, ["doc_id"]).count() == 400


def test_stratified_sample_respects_per_stratum_fraction(docs):
    out = stratified_sample(
        docs, {"en": 1.0, "de": 0.0}, strata_col="lang", key_cols=["doc_id"]
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == 100


def test_sha2_slot_matches_duckdb(spark, docs):
    got = {
        r["doc_id"]: r["slot"]
        for r in docs.select(
            "doc_id",
            F.pmod(
                F.conv(
                    F.substring(
                        F.sha2(
                            F.concat_ws(
                                "\x1f", F.col("doc_id").cast("string"), F.lit("42")
                            ),
                            256,
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(SCALE),
            ).alias("slot"),
        ).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT i, {slot_sql(['i'], 42)} FROM range(400) t(i)"
        ).fetchall()
    )
    assert got == want


def test_with_split_group_consistent_and_proportional(docs):
    out = with_split(docs, ["source"], weights={"train": 0.8, "valid": 0.1, "test": 0.1})
    per_src = out.groupBy("source").agg(F.countDistinct("split").alias("k")).collect()
    assert all(r["k"] == 1 for r in per_src)  # whole source on one side
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels <= {"train", "valid", "test"}
    n_train = out.where(F.col("split") == "train").count()
    assert n_train > 200  # 10 sources, ~80% of mass


def test_split_sql_twin_matches(spark):
    df = spark.range(300).select(F.col("id").alias("k"))
    got = {
        r["k"]: r["split"]
        for r in with_split(
            df, ["k"], weights={"train": 0.7, "test": 0.3}, hash_fn="sha2"
        ).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT i, {split_sql(['i'], {'train': 0.7, 'test': 0.3}, 42)} "
            f"FROM range(300) t(i)"
        ).fetchall()
    )
    assert got == want


# ---- chunking ---------------------------------------------------------------


def test_chunk_exact_windows(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    out = chunk_documents(df, size=4, overlap=1).orderBy("chunk_id").collect()
    assert [(r["chunk_id"], r["chunk"]) for r in out] == [
        (0, "abcd"), (1, "defg"), (2, "ghij")
    ]


def test_chunk_short_empty_null(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    out = chunk_documents(df, size=4, overlap=0).collect()
    got = {(r["doc_id"], r["chunk_id"]): r["chunk"] for r in out}
    assert got == {(1, 0): "ab", (2, 0): ""}


def test_chunk_overlap_bounds(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, overlap=-1)


def test_chunk_sql_twin_matches(spark, docs):
    got = {
        (r["doc_id"], r["chunk_id"]): r["chunk"]
        for r in chunk_documents(docs, size=10, overlap=3).collect()
    }
    rel = "(SELECT i AS doc_id, repeat('word' || i || ' ', (i % 7) + 1) AS text FROM range(400) t(i))"
    want = {
        (d, c): s
        for d, c, s in duckdb.sql(
            chunk_sql(rel, size=10, overlap=3)
        ).fetchall()
    }
    assert got == want


# ---- redaction --------------------------------------------------------------


def test_redact_pii_spans(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk ip 192.168.0.1 acct 12345678901 ok 123")],
        ["doc_id", "text"],
    )
    out = df.select(redact_pii(F.col("text")).alias("r")).collect()[0]["r"]
    assert out == "mail <EMAIL> ip <IP> acct <NUM> ok 123"


def test_redact_sql_twin_matches(spark):
    samples = [
        "plain text, no pii",
        "x@y.io and 10.0.0.7",
        "phone 4125551234567 end",
        "two mails a@b.cc c@d.ee",
        "ip-ish 1.2.3.4.5 and 300.1.2.3",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["i", "text"])
    got = {r["i"]: r["r"] for r in df.select("i", redact_pii(F.col("text")).alias("r")).collect()}
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(samples))
    want = dict(
        duckdb.sql(
            f"SELECT i, {redact_pii_sql('t')} FROM (VALUES {vals}) v(i, t)"
        ).fetchall()
    )
    assert got == want


def test_weighted_sample_prob_extremes_and_parity(spark):
    import duckdb

    from wprdc_etl_spark.functions.sampling import weighted_sample, weighted_sample_sql

    df = spark.range(600).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, F.lit(0.0))
        .when(F.col("id") % 3 == 1, F.lit(1.0))
        .otherwise(F.lit(0.5))
        .alias("w"),
    )
    kept = weighted_sample(df, "w", ["k"]).collect()
    by_w = {}
    for r in kept:
        by_w.setdefault(r["w"], []).append(r["k"])
    assert 0.0 not in by_w            # weight 0 -> never kept
    assert len(by_w[1.0]) == 200      # weight 1 -> always kept
    assert 40 < len(by_w[0.5]) < 160  # ~half
    # sha2 twin bit-parity
    got = sorted(
        r["k"]
        for r in weighted_sample(df, "w", ["k"], hash_fn="sha2").collect()
    )
    pred = weighted_sample_sql(
        "CASE WHEN i % 3 = 0 THEN 0.0 WHEN i % 3 = 1 THEN 1.0 ELSE 0.5 END",
        ["i"],
    )
    want = sorted(
        r[0] for r in duckdb.sql(f"SELECT i FROM range(600) t(i) WHERE {pred}").fetchall()
    )
    assert got == want


def test_mix_fractions_cap_and_errors():
    from wprdc_etl_spark.functions.sampling import mix_fractions

    # scarcest stratum relative to its share caps the output
    n, fr = mix_fractions({"en": 1000, "de": 100}, {"en": 0.5, "de": 0.5})
    assert n == 200 and fr["de"] == 1.0 and abs(fr["en"] - 0.1) < 1e-12
    with pytest.raises(ValueError):
        mix_fractions({"en": 10}, {"en": 0.5, "de": 0.5})  # missing stratum
    with pytest.raises(ValueError):
        mix_fractions({"en": 10}, {"en": 0.0})


def test_mix_corpus_hits_target_proportions(spark, docs):
    from wprdc_etl_spark.functions.sampling import mix_corpus

    out = mix_corpus(
        docs, {"en": 0.5, "de": 0.25, "fr": 0.25}, "lang", ["doc_id"]
    )
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(got) <= {"en", "de", "fr"}  # unlisted strata dropped
    total = sum(got.values())
    assert abs(got["en"] / total - 0.5) < 0.12   # hash-sample variance
    assert abs(got["de"] / total - 0.25) < 0.12


def test_mix_sql_twin_matches(spark, docs):
    import duckdb

    from wprdc_etl_spark.functions.sampling import mix_corpus, mix_sql

    got = sorted(
        (r["doc_id"], r["lang"])
        for r in mix_corpus(
            docs, {"en": 0.5, "de": 0.3, "fr": 0.2}, "lang", ["doc_id"],
            hash_fn="sha2",
        ).select("doc_id", "lang").collect()
    )
    rel = ("(SELECT i AS doc_id, ['en','de','fr','zz'][(CAST(i AS INT) % 4) + 1] AS lang "
           "FROM range(400) t(i))")
    want = sorted(
        duckdb.sql(
            mix_sql(rel, {"en": 0.5, "de": 0.3, "fr": 0.2},
                    strata_col="lang", key_exprs=["doc_id"],
                    select="d.doc_id, d.lang")
        ).fetchall()
    )
    assert got == want and len(got) > 0
