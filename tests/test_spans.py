"""Exact-substring repeated-span detection/removal (functions/spans.py) —
planted-duplicate guarantees, the winnowing thinning bound, and full parity
with the hash-free DuckDB twins on the fixture corpus."""

import duckdb
import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.functions.spans import (
    remove_repeated_spans,
    remove_repeated_spans_sql,
    repeated_spans,
    repeated_spans_sql,
    repeated_windows,
    window_fingerprints,
)

BOILER = "/* Copyright (c) 2020 Example Corp. All rights reserved. */"  # 59 chars


def mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def planted(spark):
    # docs 1 and 2 share BOILER at different offsets; 3 is unique; 4 repeats
    # a span within itself; 5 is entirely one shared window with 6
    return mk_docs(
        spark,
        [
            (1, "unique preamble one " + BOILER + " trailing text one"),
            (2, BOILER + " entirely different body over here"),
            (3, "no duplication in this document at all, nothing shared"),
            (4, "X" * 5 + "abcdefghijklmnopqrstuvwxyz012345" * 2 + "Y" * 5),
            (5, "Z" * 40),
            (6, "Z" * 40),
        ],
    )


def test_planted_cross_doc_span_detected(planted):
    spans = {
        (r["doc_id"], r["span_start"], r["span_len"])
        for r in repeated_spans(planted, window=30).collect()
    }
    by_doc = {}
    for d, s, ln in spans:
        by_doc.setdefault(d, []).append((s, ln))
    # the shared substring is BOILER plus the space both occurrences are
    # followed by (60 chars); doc 1's copy starts after its 20-char preamble
    assert by_doc[1] == [(21, len(BOILER) + 1)]
    assert by_doc[2] == [(1, len(BOILER) + 1)]
    assert 3 not in by_doc
    assert 5 in by_doc and 6 in by_doc


def test_within_doc_repeat_detected_and_merged(planted):
    spans = {
        (r["span_start"], r["span_len"])
        for r in repeated_spans(planted, window=30)
        .where(F.col("doc_id") == 4)
        .collect()
    }
    # the doubled 32-char alphabet block repeats within doc 4: both copies
    # merge into ONE contiguous span covering chars 6..69
    assert spans == {(6, 64)}


def test_removal_cuts_exactly_the_spans(planted):
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(planted, window=30).collect()
    }
    assert cleaned[1] == "unique preamble one trailing text one"
    assert cleaned[2] == "entirely different body over here"
    assert cleaned[3] == "no duplication in this document at all, nothing shared"
    assert cleaned[4] == "X" * 5 + "Y" * 5
    assert cleaned[5] == ""  # fully covered
    assert cleaned[6] == ""


def test_other_columns_and_empty_text_pass_through(spark):
    docs = spark.createDataFrame(
        [(1, None, "a"), (2, "", "b"), (3, "short", "c")],
        "doc_id long, text string, source string",
    )
    out = remove_repeated_spans(docs, window=10)
    assert set(out.columns) == {"doc_id", "text", "source"}
    rows = {r["doc_id"]: (r["text"], r["source"]) for r in out.collect()}
    assert rows == {1: (None, "a"), 2: ("", "b"), 3: ("short", "c")}


def test_winnowing_guarantee_and_thinning(spark):
    w, k = 20, 6
    shared = "q" + "the quick brown fox jumps over"[: w + k - 2]  # len w+k-1
    docs = mk_docs(
        spark,
        [
            (1, "prefix one padding " + shared + " suffix"),
            (2, shared + " other body text entirely unlike doc one"),
        ],
    )
    # guarantee: a common substring of length >= w+k-1 shares >=1 selected
    # fingerprint even under winnowing
    hit = repeated_windows(docs, window=w, winnow_k=k)
    assert {r["doc_id"] for r in hit.collect()} == {1, 2}
    # thinning: winnowed fingerprints are a strict, ~2/(k+1)-dense subset
    all_fp = window_fingerprints(docs, window=w, winnow_k=1).count()
    few_fp = window_fingerprints(docs, window=w, winnow_k=k).count()
    assert few_fp < all_fp
    assert few_fp <= all_fp * 3 / (k + 1) + 4
    # winnowed positions are a subset of all positions
    a = {(r["doc_id"], r["pos"]) for r in window_fingerprints(docs, window=w, winnow_k=1).collect()}
    b = {(r["doc_id"], r["pos"]) for r in window_fingerprints(docs, window=w, winnow_k=k).collect()}
    assert b <= a


@pytest.mark.parametrize("window", [20, 30])
def test_fixture_parity_with_duckdb_twins(spark, window):
    rel = "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sp = {tuple(r) for r in repeated_spans(docs, window=window).collect()}
    dsp = {tuple(r) for r in duckdb.sql(repeated_spans_sql(rel, window=window)).fetchall()}
    assert sp == dsp
    cl = {
        (r["doc_id"], r["text"])
        for r in remove_repeated_spans(docs, window=window)
        .select("doc_id", "text")
        .collect()
    }
    dcl = {tuple(r) for r in duckdb.sql(remove_repeated_spans_sql(rel, window=window)).fetchall()}
    assert cl == dcl


def test_removal_reduction_equals_span_mass(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mass = {
        r["doc_id"]: r["m"]
        for r in repeated_spans(docs, window=25)
        .groupBy("doc_id")
        .agg(F.sum("span_len").alias("m"))
        .collect()
    }
    before = {r["doc_id"]: r["n"] for r in docs.select("doc_id", F.length("text").alias("n")).collect()}
    after = {
        r["doc_id"]: r["n"]
        for r in remove_repeated_spans(docs, window=25)
        .select("doc_id", F.coalesce(F.length("text"), F.lit(0)).alias("n"))
        .collect()
    }
    for d, n0 in before.items():
        assert after[d] == n0 - mass.get(d, 0)
