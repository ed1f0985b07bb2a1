"""KMV (k-minimum-values) distinct-count sketch — mergeable, deterministic,
and exactly reproducible in SQL.

Complements ``operators/analytics.py``'s HyperLogLog++ path
(``approx_count_distinct``): HLL is the built-in 100-TB default, but its
sketch lives inside Spark's aggregate buffer — it cannot be persisted,
merged across independently-computed batches, or reproduced by an external
oracle. KMV (Bar-Yossef et al. 2002; Beyer et al. 2007 "On Synopses for
Distinct-Value Estimation") is the simplest sketch with all three
properties: the sketch IS the k smallest distinct hash values, stored as a
plain sorted ``array<long>`` column —

- **mergeable**: union the arrays, keep the k smallest distinct values —
  associative and commutative, so per-batch / per-partition / per-day
  sketches combine into exact corpus sketches (the property tested in
  tests/test_kmv.py);
- **deterministic**: same input -> bit-identical sketch, regardless of
  partitioning or arrival order;
- **oracle-able**: with the sha2 leaf (functions/dedup.py::_leaf_hash
  parity pattern) the whole sketch reproduces in DuckDB row for row.

Estimator: with j < k distinct values the sketch is the exact value set
(estimate = j); otherwise E = (k-1)/U(k) where U(k) is the k-th minimum
hash normalized to (0, 1]. Relative error ~ 1/sqrt(k-2).

Plan shape (100-TB): one hash aggregation dedups (group, hash) — map-side
partial combine, narrow rows — then a per-group bottom-k (window over the
DISTINCT hashes only; the sort never sees raw rows, let alone payloads).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from wprdc_etl_spark.functions.dedup import _leaf_hash, leaf_hash_sql

# hash-space sizes for the estimator's normalization
_BITS = {"xxhash64": 64, "sha2": 60}


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    k: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One row per group: ``sketch`` = the k smallest distinct leaf hashes
    of ``value_col`` (ascending ``array<long>``, shorter when the group has
    fewer than k distinct values). NULL values don't count (matches
    count(DISTINCT x) semantics)."""
    h = _leaf_hash(F.col(value_col).cast("string"), hash_fn)
    dist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, h.alias("_h"))
        .agg(F.lit(1))
        .select(*group_cols, "_h")
    )
    return _bottom_k(dist, group_cols, k)


def _bottom_k(dist: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group, _h) distinct rows -> (group, sketch). The window sorts only
    the already-deduplicated narrow hash rows."""
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        dist.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_h")).alias("sketch"))
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], *, k: int
) -> DataFrame:
    """Merge any number of sketch rows per group (per-batch, per-partition,
    per-source) into one: union of the hash sets, k smallest kept. Exactly
    the sketch a single pass over the union of the inputs would build."""
    dist = (
        sketches.select(*group_cols, F.explode("sketch").alias("_h"))
        .groupBy(*group_cols, "_h")
        .agg(F.lit(1))
        .select(*group_cols, "_h")
    )
    return _bottom_k(dist, group_cols, k)


def kmv_estimate(
    sketch: Column, *, k: int, hash_fn: str = "xxhash64"
) -> Column:
    """Distinct-count estimate from a sketch column. Exact (= sketch size)
    below k; (k-1)/U(k) at capacity, U(k) the k-th minimum mapped into
    (0, 1]."""
    bits = _BITS[hash_fn]
    kth = F.element_at(sketch, k).cast("double")
    if hash_fn == "xxhash64":  # signed 64-bit -> (0, 1]
        u = (kth + float(2**63) + 1.0) / float(2**64)
    else:  # 60-bit non-negative
        u = (kth + 1.0) / float(2**60)
    return F.when(F.size(sketch) < k, F.size(sketch).cast("double")).otherwise(
        (F.lit(float(k - 1))) / u
    )


def kmv_sketch_sql(
    rel: str,
    group_expr: str,
    value_expr: str,
    *,
    k: int = 64,
) -> str:
    """DuckDB twin of ``kmv_sketch(hash_fn='sha2')``, exploded to one row
    per sketch slot: (group, rank, h) — bit-identical to posexploding the
    engine's sketch array."""
    return f"""
WITH hs AS (
  SELECT DISTINCT {group_expr} AS grp,
         {leaf_hash_sql(value_expr)} AS h
  FROM {rel} WHERE {value_expr} IS NOT NULL
), rk AS (
  SELECT grp, h,
         row_number() OVER (PARTITION BY grp ORDER BY h) AS rank
  FROM hs
)
SELECT grp, rank, h FROM rk WHERE rank <= {k}
""".strip()
