"""Downstream-consumer analytics operators over the CDC table and event
streams: SCD Type-2 history, changelog-driven incremental rollups, top-k per
group, and exact/approximate grouped quantiles.

Reference tie-in: wprdc-etl's job is to keep a queryable "current state"
table fresh (``pipeline/loaders.py`` upsert). The first thing real consumers
build on top of that are (a) *history* ("what did this key look like over
time" — SCD2), (b) *aggregates kept fresh without rescanning the base table*
(rollups fed by the changelog), and (c) ranking/quantile reporting. These are
the operators that make the table useful, expressed Spark-first.

Scale shapes (the 100-TB contract for each):

- ``scd2_history``: ONE window pass partitioned by key ordered by the change
  sequence — same shuffle key as the merge itself. Callers pass fingerprint/
  metadata columns, not payload bytes: the history row set is as narrow as
  its inputs (the late-materialization rule — version intervals are a pure
  function of (key, seq); join payloads back by key+seq if a consumer needs
  them).
- ``changelog_rollup`` / ``apply_rollup``: the whole point is O(|changes|)
  instead of O(|table|) per refresh. The delta is one hash aggregate over the
  changelog slice (map-side partial), the merge-back another over
  |groups|+|changed groups| rows. At 100 TB the base table never gets
  re-scanned; the rollup state is group-cardinality-sized.
- ``topk_per_group``: rank-filter windows compile to WindowGroupLimit
  (Spark 3.5+): each map task keeps only its local top-k per group BEFORE the
  shuffle, so shuffle volume is O(groups × k × partitions), not O(rows) —
  the distributed partial-top-k. (Asserted by a plan test.)
- ``grouped_quantiles``: exact ``percentile`` buffers each group's values —
  correct for bounded groups (the oracle path). ``approx=True`` switches to
  ``approx_percentile`` (mergeable sketch, map-side partial, bounded memory)
  — the 100-TB default; the exact form is its small-scale truth twin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    *,
    keys: Sequence[str],
    seq: str,
    attrs: Sequence[str] = (),
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Slowly-changing-dimension Type-2 view of a change log: one row per
    (key, change), carrying ``valid_from_seq`` (the change's own sequence),
    ``valid_to_seq`` (the NEXT change's sequence for the same key; null while
    open) and ``is_current`` (open interval and not a delete).

    ``df`` must hold at most one row per (keys, seq) — run redelivery dedup
    first (operators/dedup.py), exactly as the merge path does. ``attrs`` are
    carried through unchanged; pass fingerprints, not payload bytes (see
    module docstring). Ties at equal ``seq`` for the same key are broken by
    ``op_col`` descending when given (matching the LWW rule in
    plans/lake.py::_lww_reduce) — else ``seq`` must be unique per key.
    """
    order = [F.col(seq).asc()]
    if op_col is not None:
        # equal-seq ties: LWW resolves op DESC as the winner, so the LOSER
        # sorts first and closes immediately — intervals stay non-overlapping
        order.append(F.col(op_col).asc())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = df.select(*keys, seq, *( [op_col] if op_col else [] ), *attrs)
    out = out.withColumn("valid_from_seq", F.col(seq)).withColumn(
        "valid_to_seq", F.lead(seq).over(w)
    )
    open_ = F.col("valid_to_seq").isNull()
    if op_col is not None:
        open_ = open_ & (F.col(op_col) != F.lit(delete_op))
    return out.withColumn("is_current", open_).drop(seq)


def changelog_rollup(
    changes: DataFrame,
    *,
    group_cols: Sequence[str],
    op_col: str = "change_op",
    count_col: str = "n_live",
) -> DataFrame:
    """The aggregate DELTA a changelog slice implies for a live-row-count
    rollup: +1 per insert, -1 per delete, 0 per update, per group. One hash
    aggregate (map-side partial) over O(|changes|) rows."""
    delta = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(F.lit(0))
    )
    return changes.groupBy(*group_cols).agg(F.sum(delta).alias(count_col))


def apply_rollup(
    state: DataFrame,
    delta: DataFrame,
    *,
    group_cols: Sequence[str],
    count_col: str = "n_live",
) -> DataFrame:
    """Fold a ``changelog_rollup`` delta into the rollup state: union + one
    hash aggregate over |groups| + |changed groups| rows; groups that reach
    zero disappear (a fully-deleted repo leaves the rollup). The base table
    is never touched — this is the incremental-materialized-view refresh."""
    s = state.select(*group_cols, F.col(count_col).alias("_n"))
    d = delta.select(*group_cols, F.col(count_col).alias("_n"))
    return (
        s.unionByName(d)
        .groupBy(*group_cols)
        .agg(F.sum("_n").alias(count_col))
        .where(F.col(count_col) > 0)
    )


def topk_per_group(
    df: DataFrame,
    *,
    group: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by ``order_by`` (pass fully-deterministic
    ordering — include a unique tiebreak column). row_number + filter; Spark
    ≥3.5 rewrites this to WindowGroupLimit, pruning every map partition to
    its local top-k before the shuffle (see module docstring)."""
    w = Window.partitionBy(*group).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= F.lit(k)
    )


def distinct_count(
    df: DataFrame,
    *,
    group: Sequence[str],
    value: str,
    approx: bool = False,
    rsd: float = 0.02,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Per-group distinct cardinality. Exact form is the oracle twin
    (two-phase hash aggregate: distinct-expand then count). ``approx=True``
    switches to the HyperLogLog++ sketch (``approx_count_distinct``) — the
    100-TB path: fixed-size mergeable sketch per group, map-side partial, no
    distinct-expand shuffle of the value column at all."""
    agg = (
        F.approx_count_distinct(F.col(value), rsd)
        if approx
        else F.countDistinct(F.col(value))
    )
    return df.groupBy(*group).agg(agg.alias(out_col))


def grouped_quantiles(
    df: DataFrame,
    *,
    group: Sequence[str],
    value: str,
    probs: Sequence[float],
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group quantiles, one column per probability (``p50``, ``p90``, …;
    p-label = prob×100, trailing .0 dropped). Exact form interpolates like
    ANSI ``percentile_cont`` (DuckDB ``quantile_cont`` — the oracle twin);
    ``approx=True`` uses the mergeable approx_percentile sketch (the 100-TB
    path; bounded memory, map-side partial aggregation)."""

    def label(p: float) -> str:
        v = p * 100
        return f"p{v:g}".replace(".", "_")

    arr = F.array(*[F.lit(float(p)) for p in probs])
    agg = (
        F.approx_percentile(F.col(value), arr, F.lit(accuracy))
        if approx
        else F.percentile(F.col(value), arr)
    )
    tmp = df.groupBy(*group).agg(agg.alias("_q"))
    return tmp.select(
        *group, *[F.col("_q").getItem(i).alias(label(p)) for i, p in enumerate(probs)]
    )


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    approx: bool = False,
    rsd: float = 0.05,
    include_min_max: bool = True,
) -> DataFrame:
    """Data-quality profile, ONE pass: per column → ``(column, total_count,
    null_count, n_distinct[, min_str, max_str])``, long format (one row per
    profiled column). The ingestion-acceptance report a pipeline runs before
    trusting a new feed — beyond the reference, whose only quality surface
    is marshmallow field errors (SURVEY A16).

    Scale shape: a SINGLE global aggregate computes every stat (no
    per-column jobs or self-joins); the long format is an ``inline`` over
    the one result row, not a shuffle. Exact ``countDistinct`` over k
    columns plans an Expand (k× the input rows through the partial
    aggregate) — fine for a profile run; ``approx=True`` swaps in the
    mergeable HyperLogLog++ sketch (no Expand, the 100-TB path, same shape
    as ``distinct_count``). min/max are computed in NATIVE column order and
    cast to string only for the uniform schema.
    """
    cols = cols or df.columns
    nd = (
        (lambda c: F.approx_count_distinct(c, rsd)) if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
        ]
        if include_min_max:
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
            ]
    row = df.agg(*aggs)
    fields = lambda c: (  # noqa: E731
        [
            F.lit(c).alias("column"),
            F.col("__n").alias("total_count"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("null_count"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        ]
        + (
            [F.col(f"__mn_{c}").alias("min_str"), F.col(f"__mx_{c}").alias("max_str")]
            if include_min_max
            else []
        )
    )
    return row.select(F.inline(F.array(*[F.struct(*fields(c)) for c in cols])))


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: per user, how far through ``steps`` did they
    get, each step matched STRICTLY after the previous one? Returns
    (user, steps_completed, completed_at) for every user in ``df`` —
    completed_at is the timestamp of the furthest matched step, NULL at 0.

    Semantics: greedy earliest-match — step 1 is the user's earliest step-1
    event, step i the earliest step-i event after the matched step i-1.
    Greedy-earliest maximizes funnel depth (matching any later step-(i-1)
    event only shrinks the window for step i), so this equals the
    "min ts after previous" chained formulation the SQL oracle uses — two
    independent constructions of the same answer.

    Scale shape: events are filtered to the step types, then ONE shuffle
    keyed by user builds each user's time-sorted step-event list and the
    funnel walk is an in-row ``aggregate`` over it (codegen'd, no Python).
    State per user = its step events only — bounded by user activity, not
    corpus size; a pathological power-user key is the same skew the engine's
    salting helpers address. Plus one narrow distinct-users aggregate so
    zero-activity users report step 0.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    step_arr = F.array(*[F.lit(s) for s in steps])
    evs = (
        df.where(F.col(type_col).isin(steps))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(type_col).alias("y")))
            ).alias("_evs")
        )
    )
    init = F.struct(
        F.lit(0).alias("step"), F.lit(None).cast("timestamp").alias("at")
    )
    walk = F.aggregate(
        "_evs",
        init,
        lambda acc, e: F.when(
            (acc["step"] < F.lit(len(steps)))
            & (e["y"] == F.element_at(step_arr, (acc["step"] + 1).cast("int")))
            & (acc["at"].isNull() | (e["t"] > acc["at"])),
            F.struct((acc["step"] + 1).alias("step"), e["t"].alias("at")),
        ).otherwise(acc),
    )
    walked = evs.select(
        F.col(user_col),
        walk["step"].alias("steps_completed"),
        walk["at"].alias("completed_at"),
    )
    users = df.select(user_col).distinct()
    return users.join(walked, user_col, "left").select(
        F.col(user_col),
        F.coalesce(F.col("steps_completed"), F.lit(0)).cast("int").alias("steps_completed"),
        F.col("completed_at"),
    )


def funnel_sql(
    relation: str,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of ``funnel`` via the chained-min formulation: step i's
    time is the min ts of a step-i event strictly after step i-1's time —
    an INDEPENDENT construction (k chained aggregates instead of one in-row
    walk), so agreement is evidence, not tautology."""
    steps = list(steps)
    ctes = [
        f"s1 AS (SELECT {user_col}, min({ts_col}) AS t FROM {relation} "
        f"WHERE {type_col} = '{steps[0]}' GROUP BY 1)"
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"s{i + 1} AS (SELECT e.{user_col}, min(e.{ts_col}) AS t "
            f"FROM {relation} e JOIN s{i} ON e.{user_col} = s{i}.{user_col} "
            f"AND e.{ts_col} > s{i}.t "
            f"WHERE e.{type_col} = '{steps[i]}' GROUP BY 1)"
        )
    k = len(steps)
    depth = " ".join(
        f"WHEN s{i}.t IS NOT NULL THEN {i}" for i in range(k, 0, -1)
    )
    at = "coalesce(" + ", ".join(f"s{i}.t" for i in range(k, 0, -1)) + ")"
    joins = " ".join(f"LEFT JOIN s{i} USING ({user_col})" for i in range(1, k + 1))
    return (
        "WITH " + ", ".join(ctes) + f", u AS (SELECT DISTINCT {user_col} FROM {relation}) "
        f"SELECT u.{user_col}, CAST(CASE {depth} ELSE 0 END AS INT) AS steps_completed, "
        f"{at} AS completed_at FROM u {joins}"
    )


def cohort_retention(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention — the second classic consumer table after the
    funnel: users cohorted by the week of their FIRST event; cell
    (cohort_week, week_k) counts the cohort's users active k weeks later
    (k=0 is the cohort size). Returns (cohort_week, week_k, n_active).

    Scale shape: first-event per user is one narrow hash agg (map-side
    min); activity is one distinct over (user, week) — both shuffles carry
    (user, timestamp) pairs only; the cohort join is user-keyed (AQE
    broadcasts the first-event side when the user dimension fits) and the
    final cell count is a map-side-combined agg over user-week rows, never
    raw events.
    """
    week = F.to_date(F.date_trunc("week", F.col(ts_col)))
    firsts = df.groupBy(user_col).agg(F.min(week).alias("cohort_week"))
    active = df.select(F.col(user_col), week.alias("_wk")).distinct()
    joined = active.join(firsts, user_col)
    k = (F.datediff(F.col("_wk"), F.col("cohort_week")) / 7).cast("int")
    return (
        joined.select("cohort_week", k.alias("week_k"), F.col(user_col))
        .groupBy("cohort_week", "week_k")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )


def cohort_retention_sql(
    relation: str,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin of cohort_retention (date_trunc week starts Monday in
    both engines, normalized to DATE; day-difference // 7)."""
    return (
        f"WITH firsts AS (SELECT {user_col}, "
        f"min(CAST(date_trunc('week', {ts_col}) AS DATE)) AS cohort_week "
        f"FROM {relation} GROUP BY 1), "
        f"active AS (SELECT DISTINCT {user_col}, "
        f"CAST(date_trunc('week', {ts_col}) AS DATE) AS wk FROM {relation}) "
        f"SELECT cohort_week, "
        f"CAST(date_diff('day', cohort_week, wk) // 7 AS INT) AS week_k, "
        f"CAST(count(DISTINCT {user_col}) AS BIGINT) AS n_active "
        f"FROM active JOIN firsts USING ({user_col}) "
        f"GROUP BY 1, 2"
    )


def iqr_outliers(
    df: DataFrame,
    *,
    group: Sequence[str],
    value: str,
    k: float = 1.5,
) -> DataFrame:
    """Tukey-fence outlier detection per group: rows whose ``value`` falls
    outside [q1 - k·IQR, q3 + k·IQR]. Returns the offending rows' group
    columns + value + the fences + a ``side`` ('low'/'high') label.

    Chosen over z-scores deliberately: exact ``percentile`` is sort-based
    and deterministic across engines and partitionings, while stddev over
    doubles is summation-order-dependent — a z-score twin could flip rows
    sitting on the threshold. All fence arithmetic here is IEEE-exact on
    both engines.

    Scale shape: one exact-percentile agg per group (the oracle path —
    swap ``grouped_quantiles(approx=True)``'s sketch in at 100 TB), the
    group-cardinality fence table broadcast back onto the scan, and a
    scan-resident filter — outliers stream out without a second shuffle.
    """
    q = grouped_quantiles(df, group=group, value=value, probs=[0.25, 0.75])
    iqr = F.col("p75") - F.col("p25")
    fences = q.select(
        *group,
        (F.col("p25") - F.lit(float(k)) * iqr).alias("lo_fence"),
        (F.col("p75") + F.lit(float(k)) * iqr).alias("hi_fence"),
    )
    j = df.join(F.broadcast(fences), list(group))
    v = F.col(value)
    return j.where((v < F.col("lo_fence")) | (v > F.col("hi_fence"))).select(
        *group,
        v.alias(value),
        F.col("lo_fence"),
        F.col("hi_fence"),
        F.when(v < F.col("lo_fence"), F.lit("low")).otherwise(F.lit("high")).alias("side"),
    )


def iqr_outliers_sql(
    relation: str,
    *,
    group: Sequence[str],
    value: str,
    k: float = 1.5,
) -> str:
    """DuckDB twin of iqr_outliers (quantile_cont == Spark's exact
    percentile, proven by the grouped-quantiles oracle; same fence
    arithmetic)."""
    g = ", ".join(group)
    return (
        f"WITH fences AS (SELECT {g}, "
        f"quantile_cont({value}, 0.25) - {float(k)} * "
        f"(quantile_cont({value}, 0.75) - quantile_cont({value}, 0.25)) AS lo_fence, "
        f"quantile_cont({value}, 0.75) + {float(k)} * "
        f"(quantile_cont({value}, 0.75) - quantile_cont({value}, 0.25)) AS hi_fence "
        f"FROM {relation} GROUP BY {g}) "
        f"SELECT r.{g.replace(', ', ', r.')}, r.{value}, f.lo_fence, f.hi_fence, "
        f"CASE WHEN r.{value} < f.lo_fence THEN 'low' ELSE 'high' END AS side "
        f"FROM {relation} r JOIN fences f USING ({g}) "
        f"WHERE r.{value} < f.lo_fence OR r.{value} > f.hi_fence"
    )


# ---- gap-filled resampling (TimescaleDB time_bucket_gapfill analog) ---------
#
# A CDC-fed events table feeding dashboards/models needs REGULAR time grids:
# a window with no events must appear as an explicit zero/null/carried row,
# or downstream rate math silently skips gaps. The reference has no
# windowing at all (SURVEY Table C); Timescale's continuous aggregates call
# this time_bucket_gapfill + locf.


def gapfill_resample(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    window_seconds: int,
    value_col: str | None = None,
    fill: str = "zero",
) -> DataFrame:
    """Per-key tumbling aggregate on a GAPLESS window grid: one row for
    every ``window_seconds`` bucket between each key's first and last
    event, event-free buckets included, flagged ``filled``. ``fill``:
    'zero' (count/sum 0), 'null', or 'locf' (value carries forward from
    the last non-empty bucket; counts stay 0).

    Window start = epoch-aligned integer-µs floor — the identical
    arithmetic as the tumbling/sliding oracles, so the 'zero'/'null' forms
    are SQL-exact (``gapfill_sql``).

    100-TB shape: one (key, window) hash agg with map-side combine, one
    narrow per-key bounds agg, the grid generated IN-ROW from the bounds
    (explode of a sequence — each key's grid is proportional to its own
    activity span, nothing global), one keyed left join back. locf adds a
    per-key window pass over bucket-grain rows (narrow; never raw events).
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    if fill not in ("zero", "null", "locf"):
        raise ValueError(f"unknown fill {fill!r}: zero | null | locf")
    span = int(window_seconds) * 1_000_000
    # ts columns arrive as TIMESTAMP_NTZ from parquet; unix_micros needs
    # TIMESTAMP — the session timezone is pinned UTC (config.py), so the
    # cast is value-preserving and matches DuckDB's naive epoch_us
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    agg = df.groupBy(
        F.col(key), (us - F.pmod(us, F.lit(span))).alias("_w")
    ).agg(*aggs)
    spine = (
        agg.groupBy(key)
        .agg(F.min("_w").alias("_lo"), F.max("_w").alias("_hi"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(span).cast("long"))
            ).alias("_w"),
        )
    )
    out = spine.join(agg, [key, "_w"], "left")
    filled = F.col("n_events").isNull().alias("filled")
    n = F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events")
    cols = [
        F.col(key),
        F.timestamp_micros(F.col("_w")).cast("timestamp_ntz").alias("window_start"),
        n,
    ]
    if value_col is not None:
        v = F.col("value_sum")
        if fill == "zero":
            v = F.coalesce(v, F.lit(0.0))
        elif fill == "locf":
            v = F.last(v, ignorenulls=True).over(
                Window.partitionBy(key).orderBy("_w")
            )
        cols.append(v.alias("value_sum"))
    return out.select(*cols, filled)


def gapfill_sql(
    relation: str,
    *,
    key: str,
    ts: str,
    window_seconds: int,
    value: str | None = None,
    round_dp: int = 4,
) -> str:
    """DuckDB twin of ``gapfill_resample(fill='zero')`` — generate_series
    over each key's own bucket bounds, epoch-µs floor identical to the
    engine's."""
    span = int(window_seconds) * 1_000_000
    val_sel = (
        f", round(coalesce(a.s, 0.0), {int(round_dp)}) AS value_sum"
        if value is not None
        else ""
    )
    val_agg = f", sum({value}) AS s" if value is not None else ""
    return (
        # ((x % span) + span) % span == Spark's pmod: DuckDB's bare % is
        # sign-preserving (truncates toward zero), which would bucket
        # pre-epoch timestamps one window later than the engine's floor
        f"WITH agg AS (SELECT {key} AS k, "
        f"epoch_us({ts}) - ((epoch_us({ts}) % {span}) + {span}) % {span} AS w, "
        f"count(*) AS n{val_agg} FROM {relation} GROUP BY k, w), "
        f"bounds AS (SELECT k, min(w) AS lo, max(w) AS hi FROM agg GROUP BY k), "
        f"spine AS (SELECT k, unnest(generate_series(lo, hi, {span})) AS w "
        f"FROM bounds) "
        f"SELECT sp.k AS {key}, make_timestamp(sp.w) AS window_start, "
        f"CAST(coalesce(a.n, 0) AS BIGINT) AS n_events{val_sel}, "
        f"a.n IS NULL AS filled "
        f"FROM spine sp LEFT JOIN agg a ON a.k = sp.k AND a.w = sp.w"
    )
