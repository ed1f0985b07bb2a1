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


# ---------------------------------------------------------------------------
# KmvRollup — the changelog-fed sketch follower
# ---------------------------------------------------------------------------

from wprdc_etl_spark.operators.kmv import KmvRollup  # noqa: E402
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable  # noqa: E402

from test_lake_merge import SCHEMA, ev  # noqa: E402


def _src(spark, tmp):
    t = ParquetSnapshotTable(
        spark, str(tmp / "src"), n_buckets=4, retain_history=8
    )
    t.ensure(SCHEMA)
    return t


def _roll(spark, tmp, src, **kw):
    kw.setdefault("group_cols", ["repo"])
    kw.setdefault("value_col", "content")
    kw.setdefault("k", 8)
    return KmvRollup(spark, str(tmp / "kmv"), src, n_buckets=4, **kw)


def _sketches(r):
    return {tuple(row[: -1]): list(row["sketch"]) for row in r.read().collect()}


def _expected(spark, pairs, k=8):
    """Sketch of literal (repo, value) ever-images, via the one-pass path."""
    df = spark.createDataFrame(pairs, "repo string, content string")
    return {
        (row["repo"],): list(row["sketch"])
        for row in kmv_sketch(df, ["repo"], "content", k=k).collect()
    }


def test_rollup_counts_ever_live_images_across_deletes(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r1", "b", "c1", "py", "B")]),
        job="j", batch_id=0,
    )
    roll = _roll(spark, tmp_path, src)
    r = roll.sync()
    assert r["mode"] == "bootstrap" and r["applied"]
    assert _sketches(roll) == _expected(spark, [("r1", "A"), ("r1", "B")])
    # update a (A -> A2), delete b: the sketch RETAINS A and B (insert-only
    # sketch semantics) and gains A2
    src.merge(
        ev(spark, [(10, "U", "r1", "a", "c1", "py", "A2"),
                   (11, "D", "r1", "b", "c1", None, None)]),
        job="j", batch_id=1,
    )
    r = roll.sync()
    assert r["mode"] == "incremental" and r["applied"]
    assert _sketches(roll) == _expected(
        spark, [("r1", "A"), ("r1", "B"), ("r1", "A2")]
    )


def test_rollup_sync_is_exactly_once_and_noop_when_caught_up(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]), job="j", batch_id=0)
    roll = _roll(spark, tmp_path, src)
    assert roll.sync()["applied"]
    before = _sketches(roll)
    again = roll.sync()
    assert again["mode"] == "noop" and not again["applied"]
    assert _sketches(roll) == before


def test_rollup_touches_only_changed_groups(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(
        ev(spark, [(1, "I", "r1", "a", "c1", "py", "A"),
                   (2, "I", "r2", "x", "c1", "go", "X")]),
        job="j", batch_id=0,
    )
    roll = _roll(spark, tmp_path, src)
    roll.sync()
    v_r2 = _sketches(roll)[("r2",)]
    src.merge(ev(spark, [(10, "I", "r1", "z", "c1", "py", "Z")]), job="j", batch_id=1)
    r = roll.sync()
    assert r["mode"] == "incremental"
    sk = _sketches(roll)
    assert sk[("r2",)] == v_r2  # untouched group's sketch unchanged
    assert sk[("r1",)] == _expected(spark, [("r1", "A"), ("r1", "Z")])[("r1",)]


def test_rollup_rides_ingest_job_follow(spark, tmp_path):
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, write_event_log

    log = str(tmp_path / "log")
    write_event_log(gen_change_events(spark, 800), log, n_files=4)
    table = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"), n_buckets=8, retain_history=8
    )
    roll = KmvRollup(
        spark, str(tmp_path / "kmv"), table,
        group_cols=["repo"], value_col="content_sha", k=16, n_buckets=4,
    )
    job = (
        IngestJob("kmv-follow")
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .follow(roll)
        .build()
    )
    job.run_batch(spark, n_chunks=2)
    assert roll.cursor() == table.published_version()
    # after a full replay with no deletes-after-the-fact pruning concerns,
    # per-repo sketches cover at least the live distinct content_shas
    live = kmv_sketch(table.read(), ["repo"], "content_sha", k=16)
    got = _sketches(roll)
    for row in live.collect():
        ever = set(got[(row["repo"],)])
        assert set(row["sketch"]) <= ever or len(ever) == 16
