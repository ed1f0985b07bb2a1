"""B4 — last-writer-wins reduction per (repo, path, commit).

Parity: the reference delegates keyed upsert resolution to the CKAN server
(``pipeline/loaders.py::CKANLoader.upsert`` POSTs records; the server updates
on primary-key match). Because the reference processes rows strictly in file
order, "last writer" is implicit. In a distributed batch the order must be
explicit: the event with the greatest ``(event_sequence, op)`` wins.

The op tiebreak ('U' > 'I' > 'D' by string order, DESC) only matters if two
*distinct* events share a sequence number, which a well-formed log never has
— but a deterministic total order is required for replay convergence
(SURVEY §8.3 #3), so ties break the same way on every run and in the DuckDB
oracle.

Physical note: one window = one shuffle by the merge key. This is the same
key the merge itself shuffles by, so with AQE the exchange is reused; at
10^10 events the per-key cardinality is tiny (a handful of revisions), so no
single task sees a hot key here — skew bites at the *repo* level, which is
why bucketing uses hash(repo, path), not repo (see plans/lake.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MERGE_KEYS = ["repo", "path", "commit"]


def latest_per_key(
    df: DataFrame,
    keys: list[str] | None = None,
    order_col: str = "event_sequence",
    op_col: str = "op",
) -> DataFrame:
    keys = keys or MERGE_KEYS
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc(), F.col(op_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
