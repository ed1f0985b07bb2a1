"""Watermarked stream-stream interval join — the live twin of the batch
``operators/relational.py::interval_join``.

Batch replay and live tail must agree (the engine's replay-reconverges
contract, SURVEY §4.4). The batch form rewrites the range predicate to a
bucketed equi-join; the streaming form uses Spark's native stream-stream
join, whose event-time bound BOTH expresses the interval semantics and
bounds the join state: each side's rows are evicted once the other side's
watermark passes the bound, so state is O(rows inside the time window),
not O(stream).

Inner-join results are emitted as soon as both sides' rows arrive —
completeness does not depend on the watermark (it only governs state
eviction) — so an availableNow drain over a finite log yields exactly the
batch join, which is how the driver oracle gates this operator
(``events_stream_join`` reuses the batch interval join's SQL twin).

100-TB shape: one keyed shuffle per side into the symmetric hash join
state; the time-bound condition is the state-cleanup contract Spark
requires for unbounded streams. No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int = 0,
    upper_seconds: int = 3600,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """INNER-join two streams on ``on`` where
    ``right_ts + lower_seconds <= left_ts <= right_ts + upper_seconds``
    (bounds inclusive — identical to the batch ``interval_join`` with an
    interval of [right_ts+lower, right_ts+upper]).

    Both inputs must be streaming DataFrames with event-time columns
    castable to TIMESTAMP; the right side's ``on`` column is dropped from
    the output (it equals the left's). Column names must not otherwise
    collide — rename before joining (the driver query shows the shape).
    """
    if lower_seconds > upper_seconds:
        raise ValueError(f"lower {lower_seconds} > upper {upper_seconds}")
    l = left.withWatermark(left_ts, watermark_delay).alias("l")
    r = right.withWatermark(right_ts, watermark_delay).alias("r")
    lo = F.expr(f"INTERVAL {int(lower_seconds)} SECONDS")
    hi = F.expr(f"INTERVAL {int(upper_seconds)} SECONDS")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"l.{left_ts}") >= F.col(f"r.{right_ts}") + lo)
        & (F.col(f"l.{left_ts}") <= F.col(f"r.{right_ts}") + hi)
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{on}"))
