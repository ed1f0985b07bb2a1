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
        u = (kth + float(2 ** (bits - 1)) + 1.0) / float(2**bits)
    else:  # non-negative, _BITS[hash_fn] wide
        u = (kth + 1.0) / float(2**bits)
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


class KmvRollup:
    """Changelog-fed distinct-count sketch table — the sketch analog of the
    engine's other followers (trigram index, SCD2 history, rollup views):
    per group, the KMV sketch of every value EVER COMMITTED LIVE to the
    source table, maintained incrementally per source version.

    Sketch semantics are insert-only (the standard streaming-sketch
    contract: KMV/HLL cannot retract): a deleted row's values stay counted
    — the sketch answers "distinct values ever observed", not "distinct in
    the current state". A bootstrap sync (fresh rollup) seeds from the
    LIVE state at the cursor version, so images that lived and died before
    the rollup existed are not counted; from then on every sync folds in
    exactly the I/U images of ``changes_between(cursor, to_v)``.

    Engine contracts reused wholesale:

    - storage is an ordinary engine table keyed and BUCKETED by the group
      columns — time travel / changelog / maintenance / CAS inherited;
    - cursor = the rollup table's own committed batch id (B8 guard):
      exactly-once per source version, replayed syncs are no-ops;
    - a sync shuffles O(|changed images| + |touched groups|) narrow rows:
      the stored sketches are read BUCKET-PRUNED to the groups the batch
      touches, never the whole rollup;
    - rides ``IngestJob.follow(rollup)`` — synced after every committed
      (micro-)batch like any changelog follower.

    A cursor expired under source retention raises (the ever-seen set
    cannot be reconstructed from states alone); sync at least once per
    source retention window — same rule as Scd2Table.
    """

    def __init__(
        self,
        spark,
        root: str,
        source,
        *,
        group_cols: list[str],
        value_col: str,
        k: int = 64,
        hash_fn: str = "xxhash64",
        job: str = "kmv",
        n_buckets: int = 8,
        retain_history: int = 1,
    ) -> None:
        from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

        self.spark = spark
        self.source = source
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.k = int(k)
        self.hash_fn = hash_fn
        self.job = job
        self.table = ParquetSnapshotTable(
            spark,
            root,
            keys=list(group_cols),
            bucket_keys=list(group_cols),
            n_buckets=n_buckets,
            retain_history=retain_history,
        )

    def cursor(self) -> int | None:
        if not self.table.exists():
            return None
        return self.table.last_committed_batch(self.job)

    def sync(self, to_version: int | None = None) -> dict:
        from wprdc_etl_spark.exceptions import SinkCommitError
        from wprdc_etl_spark.plans.lake import LineageCounts

        src_v = self.source.published_version()
        if src_v is None:
            raise SinkCommitError(
                f"source table at {self.source.root} does not exist"
            )
        to_v = src_v if to_version is None else to_version
        last = self.cursor()
        if last is not None and to_v <= last:
            return {"mode": "noop", "applied": False, "cursor": last,
                    "to_version": to_v}
        if last is None:
            mode = "bootstrap"
            vals = self.source.read(version=to_v)
            batch = kmv_sketch(
                vals, self.group_cols, self.value_col, k=self.k,
                hash_fn=self.hash_fn,
            )
        else:
            mode = "incremental"
            # changes_between projects to keys + change_op + compare_cols, so
            # the sketch's columns must be requested explicitly — the default
            # (content_sha) would drop value_col/group_cols and wedge the
            # follower on any standard table. Asking for exactly the sketch
            # columns also narrows the diff: an update that doesn't touch
            # them emits no 'U' row, and a value already in the sketch needs
            # no re-fold (insert-only semantics).
            needed = [
                c
                for c in dict.fromkeys([*self.group_cols, self.value_col])
                if c not in self.source.keys
            ]
            changes = (
                self.source.changes_between(last, to_v, compare_cols=needed)
                if needed
                else self.source.changes_between(last, to_v)
            )
            new_imgs = changes.where(F.col("change_op") != "D")
            fresh = kmv_sketch(
                new_imgs, self.group_cols, self.value_col, k=self.k,
                hash_fn=self.hash_fn,
            )
            touched = fresh.select(*self.group_cols)
            stored = (
                self.table.read_pruned_for_keys(touched)
                .join(F.broadcast(touched), self.group_cols)
                .select(*self.group_cols, "sketch")
            )
            batch = kmv_merge(
                fresh.unionByName(stored), self.group_cols, k=self.k
            )
        batch = batch.withColumn("op", F.lit("I")).withColumn(
            "event_sequence", F.lit(int(to_v)).cast("long")
        )
        self.table.ensure(batch.drop("op", "event_sequence").schema)
        res = self.table.merge(
            batch,
            job=self.job,
            batch_id=to_v,
            counts=LineageCounts(extra={"mode": mode, "source_version": to_v}),
        )
        return {
            "mode": mode,
            "applied": res.applied,
            "cursor": to_v if res.applied else last,
            "to_version": to_v,
            "rows_upserted": res.rows_upserted,
        }

    def read(self) -> DataFrame:
        return self.table.read().select(*self.group_cols, "sketch")

    def estimates(self) -> DataFrame:
        """(group..., estimate) — exact below k, (k-1)/U(k) at capacity."""
        return self.read().select(
            *self.group_cols,
            kmv_estimate(F.col("sketch"), k=self.k, hash_fn=self.hash_fn).alias(
                "estimate"
            ),
        )
