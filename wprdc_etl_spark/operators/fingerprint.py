"""B6 + B14 — content fingerprint and order-insensitive state fingerprint.

Parity: ``pipeline/connectors.py::FileConnector.connect`` computes an md5 of
the whole input file (the duplicate-run guard's checksum, SURVEY §2.4). The
engine's descendants:

- per-row ``content_sha = sha256(content)`` — the BASELINE.json per-row
  invariant vs the reference replay (``input_hint``). Built-in ``F.sha2``:
  JVM-side, whole-stage-codegen'd, no Python crossing.
- an order-insensitive *set* fingerprint over rows — sum of per-row 64-bit
  hashes in decimal(38,0) so it never overflows and is independent of row
  order and partitioning. Used for the lineage ``input_hash`` (descendant of
  the md5 checksum) and for final-state equality checks (B14) without
  collecting or sorting 10^10 rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_content_sha(df: DataFrame, content_col: str = "content", out_col: str = "content_sha") -> DataFrame:
    return df.withColumn(out_col, F.sha2(F.col(content_col), 256))


def row_hash(*cols: str | Column) -> Column:
    """64-bit per-row hash; null-safe (xxhash64 folds nulls deterministically)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


def state_fingerprint(df: DataFrame, cols: list[str]) -> str:
    """Order-insensitive fingerprint of the multiset of rows projected to
    ``cols``. One hash-aggregate job: partial sums per partition, single
    reduce — O(rows) scan, O(1) result; safe at any scale.
    """
    agg = df.select(row_hash(*cols).cast("decimal(38,0)").alias("h")).agg(
        F.coalesce(F.sum("h"), F.lit(0).cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("n"),
    )
    r = agg.collect()[0]
    return f"{r['n']}:{r['s']}"
