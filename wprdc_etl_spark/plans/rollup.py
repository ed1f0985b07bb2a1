"""RollupView — a continuous aggregate over a snapshot table, maintained
from the changelog (the materialized-view / hypertable-rollup analog).

Reference tie-in: wprdc-etl keeps the *base* table fresh and leaves
aggregation to the warehouse; at 100 TB that means every dashboard refresh
rescans the lake. A RollupView pins an aggregate (live-row counts per group
today; the delta algebra extends to any abelian aggregate) and refreshes it
from ``ParquetSnapshotTable.changes_between`` — O(|changes|) per refresh,
never O(|table|) after bootstrap.

Consistency contract (mirrors the ingest side's exactly-once design,
plans/lake.py::_swap_manifest):

- the view's meta records the SOURCE VERSION its state reflects; refresh()
  reads the source's current version first, computes bootstrap-or-delta
  against exactly that version pair, writes the new state dir, then
  atomically swaps the meta (os.replace). A crash between write and swap
  leaves the old meta pointing at the old state — the redo recomputes the
  same delta into the same versioned dir (idempotent overwrite).
- refresh() with an unchanged source version is a no-op — safe to run on a
  timer or after every ingest micro-batch.
- if the source's retention already expired the view's last-seen version
  (``SinkCommitError``), refresh falls back to a fresh bootstrap scan —
  correct at any lag, just no longer incremental for that one refresh.
  Note COW dir-sharing usually keeps the previous version's untouched
  buckets readable even at ``retain_history=0``, but only ``retain_history
  ≥ 1`` guarantees the incremental path for a view refreshed every version
  (e.g. one attached via ``IngestJob.rollup``); set it on tables that feed
  rollups.
- a stored view whose ``group_cols`` differ from the constructor's is
  rebuilt, never delta-folded (grouping mismatch would corrupt counts).

Scale shape: bootstrap is ONE hash aggregate over the table (map-side
partial); every later refresh is a hash aggregate over the changelog slice
plus a merge-back over |groups| + |changed groups| rows. State is
group-cardinality-sized, written as a single coalesced file per refresh
(group cardinality ≪ row count by construction; if a rollup's group key is
near-unique you wanted an index, not a rollup).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exceptions import SinkCommitError
from ..operators.analytics import apply_rollup, changelog_rollup
from .lake import ParquetSnapshotTable, load_manifest_keys


class RollupView:
    """Live-row-count rollup per ``group_cols`` over a ParquetSnapshotTable.

    ``compare_cols`` is forwarded to ``changes_between`` (narrow fingerprint
    compare — keep it to hashes, not payload bytes).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        source: ParquetSnapshotTable,
        *,
        group_cols: list[str],
        count_col: str = "n_live",
        compare_cols: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.source = source
        self.group_cols = list(group_cols)
        # restore the source's authoritative keys before validating the
        # grouping against them (see lake.load_manifest_keys)
        load_manifest_keys(source)
        self.count_col = count_col
        self.compare_cols = compare_cols
        # The count-delta algebra (+1 I / −1 D / 0 U) is only sound when the
        # grouping is immutable per row, i.e. derived from the MERGE KEY: a
        # mutable group column (e.g. lang) moves rows between groups via 'U'
        # changelog entries that carry no old-group information — the rollup
        # would silently drift (r3 code review). Fail loudly instead.
        bad = [c for c in self.group_cols if c not in source.keys]
        if bad:
            raise SinkCommitError(
                f"rollup group_cols must be merge-key columns "
                f"{list(source.keys)}; got non-key column(s) {bad} — a "
                f"non-key grouping needs old-value deltas the changelog "
                f"does not carry"
            )

    # ---- state layout ------------------------------------------------------

    def _meta_path(self) -> str:
        return os.path.join(self.path, "rollup_meta.json")

    def _state_dir(self, source_version: int) -> str:
        return os.path.join(self.path, "state", f"v{source_version}")

    def _read_meta(self) -> dict | None:
        try:
            with open(self._meta_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _swap_meta(self, meta: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    # ---- API ---------------------------------------------------------------

    def last_source_version(self) -> int | None:
        meta = self._read_meta()
        return None if meta is None else meta["source_version"]

    def read(self) -> DataFrame:
        meta = self._read_meta()
        if meta is None:
            raise SinkCommitError(f"rollup at {self.path} not bootstrapped yet")
        return self.spark.read.parquet(self._state_dir(meta["source_version"]))

    def refresh(self) -> dict:
        """Bring the view up to the source's current version. Returns
        ``{"mode": "noop"|"bootstrap"|"incremental", "source_version": v}``.
        """
        # PUBLISHED version, not the head: a source with an open
        # write-audit-publish chain must not leak staged rows into the view
        # (identical to current_version() for tables that never stage)
        cur = self.source.published_version()
        if cur is None:
            raise SinkCommitError("source table has no committed version")
        meta = self._read_meta()
        if meta is not None and meta.get("group_cols") != self.group_cols:
            # the view on disk was built for a different grouping — folding
            # this grouping's delta into it (or nooping on it) would silently
            # serve corrupt counts; rebuild from scratch instead
            meta = None
        if meta is not None and meta["source_version"] == cur:
            return {"mode": "noop", "source_version": cur}

        mode = "bootstrap"
        if meta is None:
            new_state = self._bootstrap()
        else:
            try:
                changes = self.source.changes_between(
                    meta["source_version"], cur, compare_cols=self.compare_cols
                )
                delta = changelog_rollup(
                    changes, group_cols=self.group_cols, count_col=self.count_col
                )
                new_state = apply_rollup(
                    self.read(), delta,
                    group_cols=self.group_cols, count_col=self.count_col,
                )
                mode = "incremental"
            except SinkCommitError:
                # lagged past source retention: one full re-bootstrap
                new_state = self._bootstrap()

        out = self._state_dir(cur)
        new_state.coalesce(1).write.mode("overwrite").parquet(out)
        old = self._read_meta()
        self._swap_meta({"source_version": cur, "group_cols": self.group_cols})
        if old is not None and old["source_version"] != cur:
            shutil.rmtree(self._state_dir(old["source_version"]), ignore_errors=True)
        return {"mode": mode, "source_version": cur}

    def _bootstrap(self) -> DataFrame:
        return self.source.read().groupBy(*self.group_cols).agg(
            F.count("*").alias(self.count_col)
        )
