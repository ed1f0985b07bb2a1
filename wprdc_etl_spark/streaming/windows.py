"""Streaming windowed aggregations — the session-window twin of the batch
``operators/relational.py::session_stats`` (gaps-and-islands).

Batch replay and live tail must agree (the engine's replay-reconverges
contract, SURVEY §4.4), so both forms exist:

- batch:   ``sessionize``/``session_stats`` — lag + cumulative-sum windows,
  exact, oracled by DuckDB (``events_sessions`` driver query).
- stream:  ``session_stats_streaming`` (here) — built-in
  ``F.session_window`` grouped state with a watermark; Spark merges
  overlapping/adjacent per-key windows as events arrive and emits a session
  row once the watermark passes its close (append mode).

Same inactivity-gap semantics; the session_window column only *groups* —
the emitted bounds are ``min(ts)``/``max(ts)`` aggregates, so rows compare
field-for-field with the batch form's output.

100-TB shape: one keyed shuffle into the session-window state store;
watermark bounds state size (sessions older than the delay are finalized
and evicted). No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def session_stats_streaming(
    stream: DataFrame,
    *,
    key: str,
    ts: str,
    gap_seconds: int,
    watermark_delay: str = "1 hour",
    value_col: Column | str | None = None,
) -> DataFrame:
    """Per-(key, session) aggregate over a streaming DataFrame using the
    built-in session window. Output columns match the batch
    ``session_stats`` (minus the synthetic 0-based ``session_id``, which has
    no streaming meaning — sessions are identified by their start time):
    key, session_start, session_end, n_events, [value_sum].
    """
    gap = f"{gap_seconds} seconds"
    w = stream.withWatermark(ts, watermark_delay)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    return (
        w.groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(*aggs)
        .drop("session_window")
    )


def sliding_stats(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    window_seconds: int,
    slide_seconds: int,
    value_col: Column | str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Sliding (hopping) time-window aggregate — each event lands in
    ``window/slide`` overlapping windows; one row per (key, window). Same
    batch/stream duality and epoch-aligned bounds as ``tumbling_stats``
    (which is the ``slide == window`` special case). SQL-expressible —
    DuckDB replays the window-start fan-out with generate_series — so the
    batch form carries the driver oracle (``events_sliding``).

    100-TB shape: the built-in ``F.window`` expands each row to its
    window/slide assignments BEFORE the aggregate, so the hash aggregate's
    map-side partial combine still collapses per (key, window) locally —
    shuffle is O(groups), but CPU and combine-map pressure scale with the
    overlap factor: keep window/slide small (2–4×), or pre-aggregate on the
    slide grain and roll up when it isn't.
    """
    if window_seconds <= 0 or slide_seconds <= 0:
        raise ValueError("window_seconds and slide_seconds must be > 0")
    if window_seconds % slide_seconds:
        raise ValueError("window_seconds must be a multiple of slide_seconds "
                         "(epoch-aligned hopping windows)")
    src = df
    if watermark_delay is not None:
        src = src.withWatermark(ts, watermark_delay)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    out = src.groupBy(
        F.col(key),
        F.window(F.col(ts), f"{window_seconds} seconds", f"{slide_seconds} seconds"),
    ).agg(*aggs)
    return out.select(
        key,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c not in (key, "window")],
    )


def tumbling_stats(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    window_seconds: int,
    value_col: Column | str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Fixed-size (tumbling) time-window aggregate — one row per
    (key, window) with start/end bounds, event count and optional value sum.
    Works on BOTH batch and streaming DataFrames (pass ``watermark_delay``
    for streams so Spark can finalize+evict windows in append mode); the
    batch form is the replay twin and is SQL-expressible, so it carries the
    DuckDB oracle (``events_tumbling`` driver query).

    Both forms group by the built-in ``F.window`` (epoch-aligned integer
    µs floor — the same arithmetic as DuckDB ``epoch_us - epoch_us % span``,
    which is what the oracle computes); streaming append mode REQUIRES the
    watermarked event-time column inside the groupBy, which ``F.window``
    satisfies and a derived bucket column would not.

    100-TB shape: ONE hash aggregate keyed on (key, window) with map-side
    partial combine — no window function, no sort; streaming state is
    bounded by the watermark. No Python in the path.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be > 0, got {window_seconds}")
    src = df
    if watermark_delay is not None:
        src = src.withWatermark(ts, watermark_delay)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    out = src.groupBy(
        F.col(key), F.window(F.col(ts), f"{window_seconds} seconds")
    ).agg(*aggs)
    return out.select(
        key,
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c not in (key, "window")],
    )
