"""NearDupIndex — incremental LSH near-dup vs the batch operator.

The load-bearing property is batch/incremental EQUIVALENCE: any split of
the corpus into add() batches must emit exactly the batch pair set, each
pair once, in the batch where its later member arrives."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures
from wprdc_etl_spark.functions.neardup_index import NearDupIndex

PARAMS = dict(n_hashes=16, shingle_k=3, n_bands=4)


def corpus(spark):
    # near-dup clusters: textual variants of shared bases + distinct docs
    rows = []
    for i in range(12):
        base = f"the quick brown fox jumps over dog number {i % 3} " * 4
        rows.append((i, base + ("!" if i % 2 else "")))
    for i in range(12, 20):
        rows.append((i, f"totally unrelated document body {i} with its own words {i*7}"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def batch_pairs(spark, docs):
    sigs = minhash_signatures(
        docs, n_hashes=PARAMS["n_hashes"], shingle_k=PARAMS["shingle_k"],
        hash_fn="sha2",
    )
    return {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in lsh_candidate_pairs(sigs, n_bands=PARAMS["n_bands"]).collect()
    }


def collect_pairs(df):
    return {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect()}


def mk_index(spark, tmp, **kw):
    kw.setdefault("hash_fn", "sha2")
    kw.setdefault("n_buckets", 4)
    return NearDupIndex(
        spark, str(tmp / "idx"),
        n_hashes=PARAMS["n_hashes"], shingle_k=PARAMS["shingle_k"],
        n_bands=PARAMS["n_bands"], **kw,
    )


def test_incremental_union_equals_batch(spark, tmp_path):
    docs = corpus(spark)
    idx = mk_index(spark, tmp_path)
    got = set()
    for b in range(3):  # three uneven batches
        got |= collect_pairs(idx.add(docs.where(F.col("doc_id") % 3 == b), batch_id=b))
    assert got == batch_pairs(spark, docs)


def test_pairs_emitted_exactly_once(spark, tmp_path):
    docs = corpus(spark)
    idx = mk_index(spark, tmp_path)
    p0 = collect_pairs(idx.add(docs.where(F.col("doc_id") < 10), batch_id=0))
    p1 = collect_pairs(idx.add(docs.where(F.col("doc_id") >= 10), batch_id=1))
    assert not {(a, b) for a, b, _ in p0} & {(a, b) for a, b, _ in p1}


def test_redelivered_batch_is_idempotent(spark, tmp_path):
    docs = corpus(spark)
    idx = mk_index(spark, tmp_path)
    first = collect_pairs(idx.add(docs.where(F.col("doc_id") < 10), batch_id=0))
    v = idx.table.current_version()
    again = collect_pairs(idx.add(docs.where(F.col("doc_id") < 10), batch_id=0))
    assert idx.table.current_version() == v  # guard skipped the merge
    assert again == first  # probe reconverges to the identical pair set


def test_remove_where_forgets_documents(spark, tmp_path):
    docs = corpus(spark)
    idx = mk_index(spark, tmp_path)
    idx.add(docs.where(F.col("doc_id") < 12), batch_id=0)
    # forget doc 0, then add a near-dup of it: no pair against 0 may appear
    idx.remove_where(F.col("doc_id") == 0)
    late = collect_pairs(idx.add(docs.where(F.col("doc_id") >= 12), batch_id=1))
    assert all(0 not in (a, b) for a, b, _ in late)
    assert idx.indexed_count() == 11 + 8


def test_est_threshold_filters(spark, tmp_path):
    docs = corpus(spark)
    idx = mk_index(spark, tmp_path, est_threshold=0.9)
    lo = collect_pairs(idx.add(docs, batch_id=0))
    assert all(e >= 0.9 for _, _, e in lo)


def test_probe_prunes_to_batch_buckets(spark, tmp_path):
    """A trickle batch must NOT read the whole index: read_pruned gets only
    the bucket ids the batch's band hashes route to."""
    docs = corpus(spark)
    idx = mk_index(spark, tmp_path)
    idx.add(docs.where(F.col("doc_id") < 16), batch_id=0)
    seen = {}
    orig = idx.table.read_pruned

    def spy(buckets, version=None):
        seen["buckets"] = sorted(buckets)
        return orig(buckets, version)

    idx.table.read_pruned = spy
    one = docs.where(F.col("doc_id") == 16)  # 4 band rows -> at most 4 buckets
    idx.add(one, batch_id=1)
    assert 0 < len(seen["buckets"]) <= PARAMS["n_bands"]
