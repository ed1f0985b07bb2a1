"""Incrementally-maintained SCD Type-2 dimension table (dbt-snapshot /
warehouse Type-2 analog) fed by the table changelog.

`operators/analytics.py::scd2_history` derives history from a RETAINED
change log; warehouses usually have the opposite problem — the upstream
table only exposes states, and history must be ACCUMULATED as it happens
(dbt's `snapshot`, Kimball Type-2 dimension loads). ``Scd2Table`` is that
accumulator built from contracts the engine already has:

- **Storage is an ordinary engine table** keyed ``(*source keys,
  valid_from_v)`` and bucketed by the source's own bucket keys — one
  version-interval row per key per change, ``valid_to_v`` NULL while
  current. Closing an interval on the next change is just an LWW upsert of
  the same table key with ``valid_to_v`` set: time travel, changelog,
  maintenance, CAS commit all inherited.
- **Cursor = the history table's own committed batch id** (B8 guard —
  exactly-once per source version, replays are no-ops, no side files).
- **Sync** reads the source changelog once (persisted — the narrow diff
  feeds the close branch, the open branch and every merge action): U/D
  keys close their open interval (the open rows are read bucket-pruned to
  the changed keys' buckets), I/U keys open a new interval at ``to_v``.
- **``as_of(v)``** filters ``valid_from_v <= v < valid_to_v`` and
  reconstructs the source's state at any synced version — WITHOUT the
  source retaining that snapshot. That reconstruction equals the source's
  own time travel, which is exactly what the driver oracle checks
  (``cdc_scd2_table`` reuses the seq-truncated golden replay).

Scale shape: a sync shuffles O(|changes|) narrow rows (keys + tracked
columns) — the history table is touched only in the changed keys' buckets;
``as_of`` is one scan with the interval predicate pushed down. Tracked
columns should stay narrow (fingerprints, not payload bytes) — the same
rule as ``changes_between``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import LineageCounts, ParquetSnapshotTable, load_manifest_keys


class Scd2Table:
    """Accumulate Type-2 history of ``source`` as its versions commit.

    ``track_cols``: the columns stored in interval rows AND compared for
    change detection (default: ``content_sha`` when the source has it,
    else every common non-key column). A change invisible to the tracked
    columns opens no new interval — same contract as ``changes_between``.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: ParquetSnapshotTable,
        *,
        track_cols: list[str] | None = None,
        job: str = "scd2",
        n_buckets: int = 16,
        retain_history: int = 1,
    ) -> None:
        self.spark = spark
        self.source = source
        self.job = job
        self._track = list(track_cols) if track_cols else None
        # restore the source's authoritative keys from its manifest before
        # deriving the history table's key/bucket layout from them
        load_manifest_keys(source)
        self.table = ParquetSnapshotTable(
            spark,
            root,
            keys=[*source.keys, "valid_from_v"],
            bucket_keys=list(source.bucket_keys),
            n_buckets=n_buckets,
            retain_history=retain_history,
        )

    def _track_cols(self, state: DataFrame) -> list[str]:
        if self._track is not None:
            return [c for c in self._track if c in state.columns]
        payload = [c for c in state.columns if c not in self.source.keys]
        return ["content_sha"] if "content_sha" in payload else payload

    def cursor(self) -> int | None:
        """Last source version folded into the history (None before the
        first sync) — from the history table's own manifest."""
        if not self.table.exists():
            return None
        return self.table.last_committed_batch(self.job)

    def _open_rows_for(self, keys_df: DataFrame) -> DataFrame:
        """Current (valid_to_v IS NULL) interval rows of the given keys —
        read bucket-pruned: the history table buckets by the source's own
        bucket keys, so the changed keys name their buckets directly."""
        return (
            self.table.read_pruned_for_keys(keys_df)
            .where(F.col("valid_to_v").isNull())
            .join(F.broadcast(keys_df), list(self.source.keys))
        )

    def sync(self, to_version: int | None = None) -> dict:
        """Fold the source's changes up to ``to_version`` (default: its
        current published version) into the history. ``mode``: 'noop' |
        'bootstrap' | 'incremental'. Exactly-once per source version. A
        cursor expired under source retention raises — history cannot be
        reconstructed from states alone without losing the intermediate
        intervals; sync at least once per source retention window."""
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

        state = self.source.read(version=to_v)
        track = self._track_cols(state)
        proj = state.select(*self.source.keys, *track)
        from_v = F.lit(int(to_v)).cast("long").alias("valid_from_v")
        open_to = F.lit(None).cast("long").alias("valid_to_v")
        changes = None
        if last is None:
            batch = proj.select("*", from_v, open_to)
            mode = "bootstrap"
        else:
            mode = "incremental"
            changes = (
                self.source.changes_between(last, to_v, compare_cols=track)
                .select(*self.source.keys, "change_op")
                .persist()
            )
            closing_keys = changes.where(F.col("change_op") != "I").select(
                *self.source.keys
            )
            closed = self._open_rows_for(closing_keys).select(
                *self.source.keys,
                *track,
                F.col("valid_from_v"),
                F.lit(int(to_v)).cast("long").alias("valid_to_v"),
            )
            opening_keys = changes.where(F.col("change_op") != "D").select(
                *self.source.keys
            )
            # the opened images come from the source pruned to the changed
            # keys' buckets — a trickle sync never scans the full source
            opened = (
                self.source.read_pruned_for_keys(opening_keys, version=to_v)
                .select(*self.source.keys, *track)
                .join(F.broadcast(opening_keys), self.source.keys)
                .select("*", from_v, open_to)
            )
            batch = closed.unionByName(opened)

        try:
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
        finally:
            if changes is not None:
                changes.unpersist()
        return {
            "mode": mode,
            "applied": res.applied,
            "cursor": to_v if res.applied else last,
            "to_version": to_v,
            "history_version": res.version,
            "rows_upserted": res.rows_upserted,
        }

    # ---- reads ------------------------------------------------------------------

    def read(self) -> DataFrame:
        """Full interval history: one row per (key, valid_from_v) with
        ``valid_to_v`` NULL on current rows."""
        return self.table.read()

    def current(self) -> DataFrame:
        """Keys' latest tracked images (== the source's live state projected
        to the tracked columns, as of the cursor)."""
        return self.read().where(F.col("valid_to_v").isNull()).drop(
            "valid_from_v", "valid_to_v"
        )

    def as_of(self, version: int) -> DataFrame:
        """The source's state AT a past synced version, reconstructed from
        intervals — no source snapshot retention needed (the dbt-snapshot
        point-in-time join)."""
        v = int(version)
        return (
            self.read()
            .where(
                (F.col("valid_from_v") <= v)
                & (F.col("valid_to_v").isNull() | (F.col("valid_to_v") > v))
            )
            .drop("valid_from_v", "valid_to_v")
        )
