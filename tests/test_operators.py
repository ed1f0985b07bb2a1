"""Core operators: dedup (B3), latest-per-key (B4), fingerprint (B6/B14),
salted repartition (B11)."""

from pyspark.sql import functions as F

from wprdc_etl_spark.operators import (
    dedup_events,
    latest_per_key,
    salted_repartition,
    state_fingerprint,
    with_content_sha,
)

ROWS = [
    # (seq, op, repo, path, commit, content)
    (0, "I", "r1", "a", "c1", "v1"),
    (0, "I", "r1", "a", "c1", "v1"),   # verbatim redelivery
    (5, "U", "r1", "a", "c1", "v2"),   # same key, later → wins
    (3, "I", "r2", "b", "c9", "x"),
    (7, "D", "r2", "b", "c9", None),   # delete wins over seq 3
    (2, "I", "r3", "c", "c3", "y"),
]
COLS = ["event_sequence", "op", "repo", "path", "commit", "content"]


def _df(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_dedup_events(spark):
    out = dedup_events(_df(spark))
    assert out.count() == 5  # one redelivery dropped


def test_latest_per_key(spark):
    out = latest_per_key(dedup_events(_df(spark)))
    got = {(r["repo"], r["path"], r["commit"]): (r["event_sequence"], r["op"]) for r in out.collect()}
    assert got == {
        ("r1", "a", "c1"): (5, "U"),
        ("r2", "b", "c9"): (7, "D"),
        ("r3", "c", "c3"): (2, "I"),
    }


def test_latest_per_key_deterministic_tiebreak(spark):
    # same sequence, different op: 'U' must beat 'I' on every run (§8.3 #3)
    df = spark.createDataFrame(
        [(1, "I", "r", "p", "c", "a"), (1, "U", "r", "p", "c", "b")], COLS
    )
    assert latest_per_key(df).collect()[0]["op"] == "U"


def test_content_sha_matches_hashlib(spark):
    import hashlib

    row = with_content_sha(_df(spark).where(F.col("content") == "v1").limit(1)).collect()[0]
    assert row["content_sha"] == hashlib.sha256(b"v1").hexdigest()


def test_state_fingerprint_order_insensitive(spark):
    a = _df(spark)
    b = spark.createDataFrame(list(reversed(ROWS)), COLS).repartition(7)
    cols = ["repo", "path", "commit", "content"]
    assert state_fingerprint(a, cols) == state_fingerprint(b, cols)
    assert state_fingerprint(a, cols) != state_fingerprint(a.limit(3), cols)


def test_salted_repartition_preserves_key_colocation(spark):
    from wprdc_etl_spark.testgen import gen_change_events

    df = salted_repartition(gen_change_events(spark, 2000), 8)
    spread = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("repo", "path")
        .agg(F.countDistinct("pid").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert spread == 1  # every (repo, path) in exactly one partition
    hot = (
        df.where(F.col("repo") == "mega/monorepo")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert hot > 1  # the hot repo fans out over multiple partitions


def test_xxhash64_matches_spark(spark):
    """Driver-side XXH64 parity (operators/xxhash.py): every tail path
    (0/4/8/31/32/45 bytes), longs incl. negatives, null skip, multi-column
    seed chaining — bit-identical with F.xxhash64."""
    from pyspark.sql import functions as F

    from wprdc_etl_spark.operators.xxhash import bucket_of_py, spark_xxhash64

    rows = [
        ("", 0), ("a", 1), ("abcd", 7), ("hello-wo", -5), ("x" * 31, 7),
        ("y" * 32, 123_456_789_012_345), ("z" * 45, -9_999_999),
        ("mega/monorepo", 2**62), ("src/d3/f77.py", None),
    ]
    df = spark.createDataFrame(rows, ["s", "l"])
    got = df.select(
        "s", "l",
        F.xxhash64("s").alias("hs"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s", "l").alias("hsl"),
        F.pmod(F.xxhash64("s", "l"), F.lit(32)).alias("b"),
    ).collect()
    for r in got:
        assert spark_xxhash64(r["s"]) == r["hs"]
        assert spark_xxhash64(r["l"]) == r["hl"]
        assert spark_xxhash64(r["s"], r["l"]) == r["hsl"]
        assert bucket_of_py(32, r["s"], r["l"]) == r["b"]


def test_xxhash64_typed_dispatch_matches_spark(spark):
    """Spark hashes Byte/Short/Int/Date via the 4-byte hashInt path and
    Long via hashLong — the ``types=`` dispatch must follow the COLUMN type,
    not the Python value (an int-keyed table's lookup() bucket depends on
    it). Also covers float/double bit-pattern paths and boolean."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from wprdc_etl_spark.operators.xxhash import spark_xxhash64

    schema = T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("sh", T.ShortType()),
        T.StructField("lg", T.LongType()),
        T.StructField("fl", T.FloatType()),
        T.StructField("db", T.DoubleType()),
        T.StructField("bo", T.BooleanType()),
    ])
    rows = [(7, 7, 7, 1.5, -2.25, True), (-123456, -5, -123456, 0.0, 1e18, False),
            (2**31 - 1, 32767, 2**62, -3.75, -0.5, True)]
    df = spark.createDataFrame(rows, schema)
    got = df.select(
        "*",
        F.xxhash64("i").alias("hi"),
        F.xxhash64("sh").alias("hsh"),
        F.xxhash64("lg").alias("hlg"),
        F.xxhash64("fl").alias("hfl"),
        F.xxhash64("db").alias("hdb"),
        F.xxhash64("bo").alias("hbo"),
        F.xxhash64("i", "lg").alias("hil"),
    ).collect()
    for r in got:
        assert spark_xxhash64(r["i"], types=["int"]) == r["hi"]
        assert spark_xxhash64(r["sh"], types=["smallint"]) == r["hsh"]
        assert spark_xxhash64(r["lg"], types=["bigint"]) == r["hlg"]
        assert spark_xxhash64(r["fl"], types=["float"]) == r["hfl"]
        assert spark_xxhash64(r["db"], types=["double"]) == r["hdb"]
        assert spark_xxhash64(r["bo"], types=["boolean"]) == r["hbo"]
        assert spark_xxhash64(r["i"], r["lg"], types=["int", "bigint"]) == r["hil"]
        # the bug the dispatch fixes: int column through the long path diverges
        assert spark_xxhash64(r["i"], types=["int"]) != spark_xxhash64(r["i"], types=["bigint"]) or r["i"] is None


def test_lookup_int_bucket_key(spark, tmp_path):
    """lookup() on a table whose bucket key is an IntegerType column must
    route to the same bucket the JVM writer hashed it into (ADVICE r2: the
    long-path fallback silently returned empty lookups for int keys)."""
    from pyspark.sql import types as T

    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ])
    tbl = ParquetSnapshotTable(
        spark, str(tmp_path / "int_tbl"), keys=["k"], bucket_keys=["k"], n_buckets=16
    )
    tbl.ensure(schema)
    batch = spark.createDataFrame(
        [(i, f"val-{i}", i, "U") for i in range(200)],
        T.StructType(list(schema.fields) + [
            T.StructField("event_sequence", T.LongType()),
            T.StructField("op", T.StringType()),
        ]),
    )
    tbl.merge(batch, job="t", batch_id=1)
    for probe in (0, 7, 123, 199):
        rows = tbl.lookup(k=probe).collect()
        assert [r["v"] for r in rows] == [f"val-{probe}"]


def test_asof_join_backward(spark):
    """As-of join: each event gets the latest dim version at-or-before its
    ts; earlier-than-all-versions events keep nulls; equal-ts versions are
    visible (ASOF semantics)."""
    import datetime as dt

    from wprdc_etl_spark.operators.relational import asof_join

    T = lambda s: dt.datetime.fromisoformat(f"2024-01-01 {s}")
    events = spark.createDataFrame(
        [(1, "u", T("09:00")), (2, "u", T("10:00")), (3, "u", T("11:30")),
         (4, "v", T("10:30")), (5, "w", T("12:00"))],
        ["event_id", "user", "ts"],
    )
    dims = spark.createDataFrame(
        [("u", T("09:30"), "bronze"), ("u", T("11:00"), "gold"),
         ("v", T("10:30"), "silver")],
        ["user", "valid_from", "tier"],
    )
    out = asof_join(events, dims, on="user", ts="ts", dim_ts="valid_from",
                    payload=["tier"])
    got = {r["event_id"]: (r["tier"], r["_asof_ts"]) for r in out.collect()}
    assert got[1] == (None, None)                 # before any version
    assert got[2] == ("bronze", T("09:30"))       # latest ≤ 10:00
    assert got[3] == ("gold", T("11:00"))         # superseded version ignored
    assert got[4] == ("silver", T("10:30"))       # equal-ts version visible
    assert got[5] == (None, None)                 # key with no dim rows
    assert out.count() == 5                       # left semantics: no fanout


def test_asof_join_duplicate_and_null_anchors(spark):
    """The late-materialized plan answers per DISTINCT (key, ts) and joins
    payload back — duplicate-(key, ts) events must not fan out, and
    null-key / null-ts events survive with null payload (eqNullSafe)."""
    import datetime as dt

    from wprdc_etl_spark.operators.relational import asof_join

    T = lambda s: dt.datetime.fromisoformat(f"2024-01-01 {s}")
    events = spark.createDataFrame(
        [(1, "u", T("10:00")), (2, "u", T("10:00")),  # same (key, ts) twice
         (3, None, T("10:00")), (4, "u", None)],
        ["event_id", "user", "ts"],
    )
    dims = spark.createDataFrame(
        [("u", T("09:30"), "bronze")], ["user", "valid_from", "tier"]
    )
    out = asof_join(events, dims, on="user", ts="ts", dim_ts="valid_from",
                    payload=["tier"])
    got = {r["event_id"]: r["tier"] for r in out.collect()}
    assert out.count() == 4
    assert got[1] == "bronze" and got[2] == "bronze"
    assert got[3] is None and got[4] is None


def test_asof_join_payload_not_in_window_sort(spark):
    """Plan shape: event payload columns must NOT enter the window's
    shuffle+sort — only the narrow (key, ts) anchors and the dim payload do
    (VERDICT r2 'payload-through-sort'). Asserted on the formatted plan: the
    Window operator and the Sort feeding it never see the content column."""
    import datetime as dt
    import re

    from wprdc_etl_spark.operators.relational import asof_join

    T = lambda s: dt.datetime.fromisoformat(f"2024-01-01 {s}")
    events = spark.createDataFrame(
        [(1, "u", T("10:00"), "BIGPAYLOAD" * 10)],
        ["event_id", "user", "ts", "content"],
    )
    dims = spark.createDataFrame(
        [("u", T("09:30"), "bronze")], ["user", "valid_from", "tier"]
    )
    out = asof_join(events, dims, on="user", ts="ts", dim_ts="valid_from",
                    payload=["tier"])
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    win_ids = re.findall(r"\((\d+)\) Window", plan)
    assert win_ids, plan
    for wid in win_ids:
        m = re.search(rf"\({wid}\) Window\nInput \[\d+\]: \[([^\]]*)\]", plan)
        assert m and "content" not in m.group(1), plan
    # the Sort(s) directly below the window sort narrow rows only
    for m in re.finditer(r"\((\d+)\) Sort\nInput \[\d+\]: \[([^\]]*)\]", plan):
        if "_is_event" in m.group(2):  # the window's sort, not a join sort
            assert "content" not in m.group(2), plan


def test_sessionize_and_stats(spark):
    import datetime as dt

    from wprdc_etl_spark.operators.relational import session_stats, sessionize

    T = lambda m: dt.datetime(2024, 1, 1, 9, m)
    df = spark.createDataFrame(
        [("u", T(0), 1.0), ("u", T(10), 2.0), ("u", T(50), 4.0),
         ("u", T(55), 8.0), ("v", T(5), 16.0)],
        ["user", "ts", "value"],
    )
    s = {(r["user"], r["ts"].minute): r["session_id"]
         for r in sessionize(df, key="user", ts="ts", gap_seconds=1200).collect()}
    assert s[("u", 0)] == 0 and s[("u", 10)] == 0      # 10-min gap: same
    assert s[("u", 50)] == 1 and s[("u", 55)] == 1     # 40-min gap: new
    assert s[("v", 5)] == 0                            # per-key numbering
    stats = session_stats(df, key="user", ts="ts", gap_seconds=1200, value_col="value")
    got = {(r["user"], r["session_id"]): (r["n_events"], r["value_sum"])
           for r in stats.collect()}
    assert got[("u", 0)] == (2, 3.0)
    assert got[("u", 1)] == (2, 12.0)
    assert got[("v", 0)] == (1, 16.0)


# ---------------------------------------------------------------------------
# analytics operators (SCD2, rollup, top-k, quantiles)
# ---------------------------------------------------------------------------


def test_scd2_history_intervals(spark):
    from wprdc_etl_spark.operators.analytics import scd2_history

    rows = [
        # key "a": insert, update, delete
        ("a", 1, "I", "s1"), ("a", 3, "U", "s2"), ("a", 7, "D", None),
        # key "b": insert only (open + current)
        ("b", 2, "I", "s3"),
    ]
    df = spark.createDataFrame(rows, ["k", "seq", "op", "sha"])
    out = scd2_history(df, keys=["k"], seq="seq", attrs=["sha"], op_col="op")
    got = {(r["k"], r["valid_from_seq"]): r.asDict() for r in out.collect()}
    assert got[("a", 1)]["valid_to_seq"] == 3 and not got[("a", 1)]["is_current"]
    assert got[("a", 3)]["valid_to_seq"] == 7 and not got[("a", 3)]["is_current"]
    # the delete closes the history: open interval but NOT current
    assert got[("a", 7)]["valid_to_seq"] is None and not got[("a", 7)]["is_current"]
    assert got[("b", 2)]["valid_to_seq"] is None and got[("b", 2)]["is_current"]
    # intervals per key never overlap and cover each change exactly once
    assert len(got) == len(rows)


def test_scd2_current_rows_match_latest_per_key(spark):
    """is_current rows of the SCD2 view == latest_per_key live rows — the
    history view and the merge's LWW rule must agree on 'now'."""
    from wprdc_etl_spark.operators.analytics import scd2_history
    from wprdc_etl_spark.operators.dedup import dedup_events
    from wprdc_etl_spark.operators.latest import latest_per_key
    from wprdc_etl_spark.testgen import gen_change_events

    ev = dedup_events(gen_change_events(spark, 2000))
    hist = scd2_history(
        ev.select("repo", "path", "commit", "event_sequence", "op"),
        keys=["repo", "path", "commit"], seq="event_sequence", op_col="op",
    )
    cur = {(r["repo"], r["path"], r["commit"])
           for r in hist.where("is_current").collect()}
    live = {(r["repo"], r["path"], r["commit"])
            for r in latest_per_key(ev).where("op <> 'D'").collect()}
    assert cur == live and len(cur) > 0


def test_rollup_incremental_equals_full_recompute(spark):
    from wprdc_etl_spark.operators.analytics import apply_rollup, changelog_rollup

    state = spark.createDataFrame(
        [("r1", 3), ("r2", 1), ("r3", 2)], ["repo", "n_live"])
    changes = spark.createDataFrame(
        [("r1", "x", "I"), ("r1", "y", "U"), ("r2", "z", "D"),
         ("r4", "w", "I"), ("r3", "q", "D"), ("r3", "p", "D")],
        ["repo", "path", "change_op"])
    out = {r["repo"]: r["n_live"] for r in apply_rollup(
        state, changelog_rollup(changes, group_cols=["repo"]),
        group_cols=["repo"]).collect()}
    # r1: 3+1=4 (U is a no-op); r2: 1-1=0 → dropped; r3: 2-2=0 → dropped;
    # r4: new group from delta alone
    assert out == {"r1": 4, "r4": 1}


def test_topk_per_group_plan_uses_window_group_limit(spark):
    from pyspark.sql import functions as F

    from wprdc_etl_spark.operators.analytics import topk_per_group

    df = spark.range(0, 10000).select(
        (F.col("id") % 7).alias("g"), F.col("id").alias("v"))
    out = topk_per_group(df, group=["g"], order_by=[F.col("v").desc()], k=3)
    # correctness: top-3 ids per residue class mod 7
    got = {(r["g"], r["rank"]): r["v"] for r in out.collect()}
    assert got[(0, 1)] == 9996 and got[(0, 3)] == 9982
    assert len(got) == 21
    # the 100-TB property: rank-filter pushes a per-map-task partial top-k
    # (WindowGroupLimit) below the shuffle, so shuffle volume is O(g*k/task)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_grouped_quantiles_exact_and_approx(spark):
    from pyspark.sql import functions as F

    from wprdc_etl_spark.operators.analytics import grouped_quantiles

    df = spark.range(0, 1001).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v"))
    exact = grouped_quantiles(df, group=["g"], value="v", probs=[0.5, 0.9]).collect()[0]
    assert exact["p50"] == 500.0 and exact["p90"] == 900.0
    approx = grouped_quantiles(
        df, group=["g"], value="v", probs=[0.5, 0.9], approx=True).collect()[0]
    # sketch error bound: within 1% of the exact value at accuracy=10000
    assert abs(approx["p50"] - 500.0) <= 10 and abs(approx["p90"] - 900.0) <= 10


def test_distinct_count_exact_vs_hll(spark):
    from pyspark.sql import functions as F

    from wprdc_etl_spark.operators.analytics import distinct_count

    df = spark.range(0, 20000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 3000).alias("u"))
    # 3000 is even, so each parity class g sees exactly 1500 residues
    exact = {r["g"]: r["n_distinct"] for r in
             distinct_count(df, group=["g"], value="u").collect()}
    assert exact == {0: 1500, 1: 1500}
    hll = {r["g"]: r["n_distinct"] for r in
           distinct_count(df, group=["g"], value="u", approx=True).collect()}
    # HLL++ at rsd=0.02: within ~3 standard errors of exact
    for g, n in hll.items():
        assert abs(n - 1500) <= 1500 * 0.06, (g, n)


def test_interval_join_correct_and_no_nested_loop(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from wprdc_etl_spark.operators.relational import interval_join

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    facts = spark.createDataFrame(
        [(1, "u", T(9, 30)), (2, "u", T(12, 0)), (3, "v", T(9, 30)),
         (4, "u", T(10, 0))],
        ["fid", "user", "ts"])
    ivls = spark.createDataFrame(
        [("u", T(9), T(10), "a"),      # catches fid 1 and 4 (boundary)
         ("u", T(9, 45), T(11), "b"),  # catches fid 4 (overlapping window)
         ("v", T(11), T(12), "c")],    # wrong user for fid 3's 9:30
        ["user", "s", "e", "tag"])
    out = interval_join(
        facts, ivls, ts="ts", start="s", end="e", on="user",
        payload=["tag"], bucket_seconds=1800)
    got = sorted((r["fid"], r["tag"]) for r in out.collect())
    # one row per qualifying (fact, interval) pair; boundaries inclusive;
    # overlapping windows both match; key mismatch excludes
    assert got == [(1, "a"), (4, "a"), (4, "b")]
    # the scale property: bucketed expansion plans as an EQUI join —
    # never BroadcastNestedLoopJoin (the raw-BETWEEN plan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    # and each pair matched exactly once (no dedup pass hiding duplicates)
    assert out.count() == 3


def test_spark_xxhash64_date_timestamp_parity(spark):
    """DateType/TimestampType parity: Python date/datetime values hash
    bit-identically to Spark's internal days-since-epoch (int32 path) /
    epoch-micros (int64 path) — the r3 fix for typed driver-side hashing
    of temporal bucket keys."""
    import datetime as dt

    from pyspark.sql import functions as F

    from wprdc_etl_spark.operators.xxhash import spark_xxhash64

    df = spark.createDataFrame(
        [(dt.date(2024, 2, 29), dt.datetime(2024, 2, 29, 12, 34, 56, 789012)),
         (dt.date(1969, 12, 31), dt.datetime(1970, 1, 1, 0, 0, 0, 1))],
        "d date, t timestamp_ntz",
    ).select(
        "d", "t",
        F.xxhash64("d").alias("hd"),
        F.xxhash64("t").alias("ht"),
        F.xxhash64("d", "t").alias("hdt"),
    )
    for r in df.collect():
        assert spark_xxhash64(r["d"], types=["date"]) == r["hd"]
        assert spark_xxhash64(r["t"], types=["timestamp_ntz"]) == r["ht"]
        assert spark_xxhash64(r["d"], r["t"], types=["date", "timestamp_ntz"]) == r["hdt"]


# ---- profile_table (operators/analytics.py) -------------------------------


def test_profile_table_exact_stats_native_order(spark):
    from wprdc_etl_spark.operators.analytics import profile_table

    df = spark.createDataFrame(
        [(2, "a"), (10, "b"), (None, "b"), (7, None)], ["n", "s"]
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["n"]["total_count"] == 4
    assert got["n"]["null_count"] == 1
    assert got["n"]["n_distinct"] == 3
    # native numeric order THEN string cast: max is 10, not "7"
    assert (got["n"]["min_str"], got["n"]["max_str"]) == ("2", "10")
    assert got["s"]["null_count"] == 1 and got["s"]["n_distinct"] == 2


def test_profile_table_approx_within_bounds(spark):
    from wprdc_etl_spark.operators.analytics import profile_table

    df = spark.range(5000).selectExpr("id % 1000 AS k")
    r = {x["column"]: x for x in profile_table(df, ["k"], approx=True).collect()}
    assert abs(r["k"]["n_distinct"] - 1000) <= 150  # HLL++ rsd=0.05 slack


def test_funnel_semantics(spark):
    """Greedy earliest-match funnel: strictly-after ordering, partial
    depths, zero-activity users present at step 0."""
    from datetime import datetime

    from wprdc_etl_spark.operators.analytics import funnel

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rows = [
        # u1 completes in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: purchase BEFORE click -> stops at 2
        (2, t(1), "view"), (2, t(2), "purchase"), (2, t(3), "click"),
        # u3: only later steps, never step 1 -> 0
        (3, t(1), "click"), (3, t(2), "purchase"),
        # u4: unrelated events only -> 0 (but present)
        (4, t(1), "error"),
        # u5: same-ts step events do NOT chain (strictly after)
        (5, t(1), "view"), (5, t(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: (r["steps_completed"], r["completed_at"]) for r in
           funnel(df, ["view", "click", "purchase"]).collect()}
    assert got[1] == (3, t(3))
    assert got[2] == (2, t(3))   # click matched at t3, purchase at t2 ignored
    assert got[3][0] == 0 and got[3][1] is None
    assert got[4][0] == 0
    assert got[5][0] == 1        # click at the same instant doesn't count
    assert len(got) == 5


def test_cohort_retention(spark):
    """Cohorting by first-event week; k counts weeks since cohort; users
    only count in weeks they're active."""
    from datetime import datetime

    from wprdc_etl_spark.operators.analytics import cohort_retention

    d = lambda day, h=0: datetime(2026, 3, day, h)  # 2026-03-02 is a Monday
    rows = [
        (1, d(2)), (1, d(9)), (1, d(16)),   # cohort w0, active k=0,1,2
        (2, d(3)), (2, d(17)),              # cohort w0, active k=0,2 (skips 1)
        (3, d(10)),                         # cohort w1, active k=0 only
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"].isoformat(), r["week_k"]): r["n_active"]
        for r in cohort_retention(df).collect()
    }
    assert got[("2026-03-02", 0)] == 2
    assert got[("2026-03-02", 1)] == 1   # only user 1
    assert got[("2026-03-02", 2)] == 2
    assert got[("2026-03-09", 0)] == 1
    assert ("2026-03-09", 1) not in got


def test_iqr_outliers(spark):
    from wprdc_etl_spark.operators.analytics import iqr_outliers

    rows = [("a", float(v)) for v in [10, 11, 12, 13, 14, 100]] + [
        ("b", float(v)) for v in [50, 51, 52, 53, -40]
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["g"], r["v"]): r["side"] for r in
           iqr_outliers(df, group=["g"], value="v").collect()}
    assert got[("a", 100.0)] == "high"
    assert got[("b", -40.0)] == "low"
    assert len(got) == 2  # inliers stay out


def test_gapfill_resample_modes(spark):
    """Gap-filled resampling (operators/analytics.py::gapfill_resample —
    time_bucket_gapfill analog): gapless per-key grid, fill semantics."""
    from wprdc_etl_spark.operators.analytics import gapfill_resample

    rows = [
        # user 1: events in hours 0 and 3 -> hours 1,2 are gaps
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 00:40:00", 5.0),
        (1, "2024-01-01 03:20:00", 7.0),
        # user 2: single hour -> one row, no gaps
        (2, "2024-01-01 05:05:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts"), "value"
    )
    out = {
        (r["user_id"], str(r["window_start"])): r
        for r in gapfill_resample(
            df, key="user_id", ts="ts", window_seconds=3600, value_col="value"
        ).collect()
    }
    assert len(out) == 5  # user1 hours 0..3 + user2 hour 5
    h0 = out[(1, "2024-01-01 00:00:00")]
    assert h0["n_events"] == 2 and h0["value_sum"] == 15.0 and not h0["filled"]
    h1 = out[(1, "2024-01-01 01:00:00")]
    assert h1["n_events"] == 0 and h1["value_sum"] == 0.0 and h1["filled"]
    assert out[(1, "2024-01-01 03:00:00")]["value_sum"] == 7.0
    assert out[(2, "2024-01-01 05:00:00")]["n_events"] == 1

    # locf: gap hours carry the last non-empty bucket's sum; counts stay 0
    locf = {
        (r["user_id"], str(r["window_start"])): r
        for r in gapfill_resample(
            df, key="user_id", ts="ts", window_seconds=3600,
            value_col="value", fill="locf",
        ).collect()
    }
    assert locf[(1, "2024-01-01 01:00:00")]["value_sum"] == 15.0
    assert locf[(1, "2024-01-01 02:00:00")]["value_sum"] == 15.0
    assert locf[(1, "2024-01-01 03:00:00")]["value_sum"] == 7.0
    assert locf[(1, "2024-01-01 01:00:00")]["n_events"] == 0

    # null: gaps stay null
    nul = {
        (r["user_id"], str(r["window_start"])): r
        for r in gapfill_resample(
            df, key="user_id", ts="ts", window_seconds=3600,
            value_col="value", fill="null",
        ).collect()
    }
    assert nul[(1, "2024-01-01 02:00:00")]["value_sum"] is None

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown fill"):
        gapfill_resample(df, key="user_id", ts="ts", window_seconds=3600,
                         value_col="value", fill="bogus")
    with _pytest.raises(ValueError, match="window_seconds"):
        gapfill_resample(df, key="user_id", ts="ts", window_seconds=0)
