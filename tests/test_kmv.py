"""KMV distinct sketch (operators/kmv.py): the merge law (the property HLL
buffers can't give you), below-capacity exactness, estimator accuracy, and
partitioning-independence."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.operators.kmv import kmv_estimate, kmv_merge, kmv_sketch

EV = "/root/testdata/sf0.01/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EV)


def as_map(df):
    return {r["event_type"]: list(r["sketch"]) for r in df.collect()}


@pytest.mark.parametrize("hash_fn", ["xxhash64", "sha2"])
def test_merge_of_split_batches_equals_whole(events, hash_fn):
    """The mergeability law: per-batch sketches unioned == one-pass sketch,
    for ANY split — here 3 hash-disjoint slices of the event log."""
    k = 32
    whole = as_map(kmv_sketch(events, ["event_type"], "user_id", k=k, hash_fn=hash_fn))
    parts = [
        kmv_sketch(
            events.where(F.pmod(F.xxhash64("event_id"), F.lit(3)) == i),
            ["event_type"],
            "user_id",
            k=k,
            hash_fn=hash_fn,
        )
        for i in range(3)
    ]
    merged = as_map(kmv_merge(parts[0].unionByName(parts[1]).unionByName(parts[2]),
                              ["event_type"], k=k))
    assert merged == whole


def test_below_capacity_sketch_is_exact_value_set(spark):
    df = spark.createDataFrame(
        [("a", i % 5) for i in range(100)], "g string, v long"
    )
    sk = kmv_sketch(df, ["g"], "v", k=64)
    row = sk.collect()[0]
    assert len(row["sketch"]) == 5
    est = sk.select(kmv_estimate(F.col("sketch"), k=64).alias("e")).collect()[0]["e"]
    assert est == 5.0


@pytest.mark.parametrize("hash_fn", ["xxhash64", "sha2"])
def test_estimate_accuracy_at_capacity(events, hash_fn):
    k = 256
    sk = kmv_sketch(events, ["event_type"], "user_id", k=k, hash_fn=hash_fn)
    est = {
        r["event_type"]: r["e"]
        for r in sk.select(
            "event_type", kmv_estimate(F.col("sketch"), k=k, hash_fn=hash_fn).alias("e")
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        if n <= k:
            assert est[t] == float(n)
        else:  # ~1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
            assert abs(est[t] - n) / n < 0.25, (t, est[t], n)


def test_sketch_is_partitioning_invariant(events):
    a = as_map(kmv_sketch(events.repartition(37), ["event_type"], "user_id", k=16))
    b = as_map(kmv_sketch(events.coalesce(1), ["event_type"], "user_id", k=16))
    assert a == b


def test_nulls_do_not_count(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", None)], "g string, v long"
    )
    sk = kmv_sketch(df, ["g"], "v", k=8).collect()[0]
    assert len(sk["sketch"]) == 1
