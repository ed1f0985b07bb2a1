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

Physical note — hash aggregate, NOT a window. ``max_by(struct(*row),
struct(order, op))`` compiles to ObjectHashAggregate with a map-side partial
aggregate: redundant versions of a key collapse *before* the shuffle and
nothing is sorted, vs. a ``row_number`` window that shuffles every row and
sorts each partition. At 10^10 events with a handful of revisions per key,
the partial aggregation cuts shuffle volume by the revision factor. Per-key
cardinality is tiny, so no hot key exists at this grain — skew bites at the
*repo* level, which is why bucketing uses hash(repo, path), not repo
(see plans/lake.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_KEYS = ["repo", "path", "commit"]


def latest_per_key(
    df: DataFrame,
    keys: list[str] | None = None,
    order_col: str = "event_sequence",
    op_col: str = "op",
) -> DataFrame:
    keys = keys or MERGE_KEYS
    ordering = F.struct(F.col(order_col), F.col(op_col))
    payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), ordering).alias("_row")
    )
    return agg.select(*keys, "_row.*").select(*df.columns)
