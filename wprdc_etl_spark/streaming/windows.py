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
