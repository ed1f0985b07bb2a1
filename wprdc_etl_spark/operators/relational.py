"""Operators Spark's DataFrame API lacks as primitives: as-of join and
sessionization — both expressed as compositions of built-in ops (the brief's
preferred tier (a): no Python, no explicit state), each with an exact ANSI-SQL
twin for the DuckDB oracle.

Reference tie-in: the reference joins each extracted row against the "current"
datastore state at load time (``pipeline/loaders.py`` upsert-by-key). The
as-of join generalizes that to time-versioned enrichment (join each event to
the latest dimension version at or before its timestamp); sessionization is
the standard event-stream grouping every CDC/analytics pipeline needs.

Scale shapes:

- ``asof_join``: union(distinct event anchors, dim-versions) → ONE window
  pass partitioned by key ordered by (ts, tag) carrying
  ``last(dim, ignorenulls=True)`` forward, then the event PAYLOAD joins back
  by (key, ts) — the engine's late-materialization idiom (plans/lake.py
  merge): only narrow (key, ts) anchors and the dim payload ride the window
  shuffle+sort; event content bytes never do (at 100 TB the events side
  dwarfs the dims side, and sorting content bytes is the classic
  payload-through-sort trap the merge path engineered out). No range
  explosion, no per-event probe. Skewed keys ride the same salting/AQE story
  as every other keyed shuffle here.
- ``sessionize``: lag + cumulative sum over (key, ts) — the gaps-and-islands
  construction; one shuffle on the key. (Streaming twin: F.session_window —
  see streaming/job.py docs; this is the batch/replay form.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    events: DataFrame,
    dims: DataFrame,
    *,
    on: str,
    ts: str,
    dim_ts: str,
    payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each event row: the payload of the dim row with the greatest
    ``dim_ts <= ts`` for the same key (direction='backward'; the classic
    as-of/point-in-time join). Events with no prior dim version keep nulls.

    Output: all event columns + ``payload`` columns (+ ``_asof_ts``).
    Dim rows tie-break on ``dim_ts`` (latest wins; equal-ts versions are
    resolved by the latest in the union order, matching DuckDB ASOF JOIN's
    greatest-qualifying-match semantics).
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    # LATE MATERIALIZATION: the asof answer is a pure function of (key, ts),
    # so only the DISTINCT event anchors enter the window — event payload
    # columns stay out of the shuffle+sort entirely and join back at the end.
    anchors = events.select(F.col(on).alias("_k"), F.col(ts).alias("_t")).distinct()
    tagged_e = anchors.select(
        "_k",
        "_t",
        F.lit(1).alias("_is_event"),
        *[F.lit(None).cast(dims.schema[c].dataType).alias(f"_d_{c}") for c in payload],
        F.lit(None).cast(dims.schema[dim_ts].dataType).alias("_dts"),
    )
    tagged_d = dims.select(
        F.col(on).alias("_k"),
        F.col(dim_ts).alias("_t"),
        F.lit(0).alias("_is_event"),
        *[F.col(c).alias(f"_d_{c}") for c in payload],
        F.col(dim_ts).alias("_dts"),
    )
    # dims sort BEFORE events at equal _t (_is_event 0 < 1), so an event at
    # exactly a version's timestamp sees that version — ASOF semantics
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_event").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_e.unionByName(tagged_d).select(
        "_is_event",
        "_k",
        "_t",
        *[F.last(f"_d_{c}", ignorenulls=True).over(w).alias(f"_d_{c}") for c in payload],
        F.last("_dts", ignorenulls=True).over(w).alias("_asof_ts"),
    )
    # one row per distinct (key, ts) → the payload join-back multiplies each
    # event row by exactly 1. eqNullSafe keeps null-key / null-ts events (a
    # plain equi-join would drop them; they carry null payload like before).
    asof = carried.where(F.col("_is_event") == 1).drop("_is_event")
    return events.join(
        asof,
        on=F.col(on).eqNullSafe(F.col("_k")) & F.col(ts).eqNullSafe(F.col("_t")),
        how="left",
    ).select(
        *events.columns,
        *[F.col(f"_d_{c}").alias(c) for c in payload],
        "_asof_ts",
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    *,
    ts: str,
    start: str,
    end: str,
    on: str | None = None,
    payload: list[str],
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range/interval join: each fact row paired with every interval row
    whose ``[start, end]`` contains its ``ts`` (and whose key matches, when
    ``on`` is given) — one output row per qualifying (fact, interval) pair.

    Spark has no native range join: a raw ``f.ts BETWEEN i.start AND i.end``
    predicate plans as BroadcastNestedLoopJoin (O(|facts|×|intervals|) —
    dead at scale). This is the standard bucketed-expansion rewrite instead:
    intervals explode to one row per ``bucket_seconds``-wide time bucket
    they cover, facts map to their single bucket, and the join is a plain
    EQUI-join on (key, bucket) + a residual range filter. Each qualifying
    pair matches in exactly one bucket (the fact's), so no dedup pass is
    needed. Shuffle is O(|facts| + |intervals|·len/width); pick
    ``bucket_seconds`` near the median interval length so each interval
    explodes to ~1–2 rows. Long-tail intervals fan out linearly — cap them
    upstream or split the dimension by duration if one interval spans
    months.

    Output: all fact columns + ``payload`` columns + ``_ivl_start``/
    ``_ivl_end`` of the matched interval.
    """
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    w = F.lit(bucket_seconds * 1_000_000)
    ikeys = ([F.col(on)] if on else []) + [
        F.explode(F.sequence(F.floor(us(start) / w), F.floor(us(end) / w))).alias("_bkt")
    ]
    i = intervals.select(
        *ikeys,
        us(start).alias("_ivl_start_us"),
        us(end).alias("_ivl_end_us"),
        F.col(start).alias("_ivl_start"),
        F.col(end).alias("_ivl_end"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    f = facts.withColumn("_bkt", F.floor(us(ts) / w)).withColumn("_ts_us", us(ts))
    cond = [f["_bkt"] == i["_bkt"]] + ([f[on] == i[on]] if on else [])
    joined = f.join(i, cond, "inner").where(
        (F.col("_ts_us") >= F.col("_ivl_start_us"))
        & (F.col("_ts_us") <= F.col("_ivl_end_us"))
    )
    return joined.select(
        *[f[c] for c in facts.columns],
        *[F.col(f"_p_{c}").alias(c) for c in payload],
        "_ivl_start",
        "_ivl_end",
    )


def sessionize(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign a session id per key: a new session starts when the gap from
    the previous event (same key, ts order, ties broken by the full row's
    arbitrary-but-deterministic order) exceeds ``gap_seconds``. Output: input
    columns + ``session_id`` (0-based per key, by time)."""
    order = [F.col(ts).asc()] + [F.col(c).asc() for c in df.columns if c != ts]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.col(ts)).over(w)
    # microsecond-exact gap: unix_micros (Spark) == epoch_us (DuckDB), both
    # integers — second-truncation would disagree with the oracle at edges.
    # NTZ columns cast to TIMESTAMP first (sessions run UTC: same instant).
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    new_session = (
        prev.isNull() | (us(F.col(ts)) - us(prev) > F.lit(gap_seconds * 1_000_000))
    ).cast("long")
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_stats(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    value_col: Column | str | None = None,
) -> DataFrame:
    """Sessionize then aggregate: one row per (key, session_id) with start,
    end, event count and optional value sum — the batch replay twin of a
    streaming ``F.session_window`` aggregation."""
    s = sessionize(df, key=key, ts=ts, gap_seconds=gap_seconds)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return s.groupBy(key, "session_id").agg(*aggs)
