"""IcebergTable — the production sink for clusters with the Iceberg runtime.

Same ``LakeTable`` contract as ``ParquetSnapshotTable`` (whose merge
semantics are deliberately an exact subset of Iceberg MERGE, SURVEY §8.3 #1)
so the two are drop-ins. THIS SANDBOX HAS NO ICEBERG JAR AND NO NETWORK
(SURVEY §5 note), so this class is capability-gated: ``iceberg_available()``
is False here and every test parameterized over sinks skips it; on a real
cluster (``--packages org.apache.iceberg:iceberg-spark-runtime-...`` + a
catalog conf) it activates unchanged. The SQL the class emits is built by
pure functions (``merge_sql``/``ensure_sql``) unit-tested without the jar
(tests/test_iceberg_sql.py).

Parity: generalizes ``pipeline/loaders.py::CKANDatastoreLoader.load`` —
``datastore_upsert`` with ``method='upsert'`` → MERGE INTO keyed on
(repo, path, commit); ``method='insert'``'s delete-and-recreate →
``truncate()`` (overwrite snapshot).

Exactly-once protocol: the ``last-batch.<job>`` guard travels INSIDE the
MERGE's own snapshot as a snapshot summary property (Iceberg reads any
``snapshot-property.*`` session conf into the commit summary), so guard and
data publish atomically — a crash can never commit one without the other.
``last_committed_batch`` reads it back from the snapshots metadata table.
The lineage side table and TBLPROPERTIES mirror are written AFTER the
snapshot commits: losing them to a crash costs observability rows only,
never correctness (the replayed batch is skipped by the in-snapshot guard).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import (
    LakeTable,
    LineageCounts,
    MergeResult,
    _lww_reduce,
    _widen_type,
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def ensure_sql(table: str, schema: T.StructType, *, n_buckets: int = 64) -> str:
    """CREATE TABLE DDL. Iceberg buckets a single column, so bucket path
    (high cardinality) — same hot-repo spreading goal as the snapshot
    table's xxhash64(repo, path)."""
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    return (
        f"CREATE TABLE {table} ({ddl}, _seq BIGINT, _op STRING) USING iceberg "
        f"PARTITIONED BY (bucket({n_buckets}, path))"
    )


def evolve_sql(table: str, new_fields: list[T.StructField]) -> str:
    adds = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in new_fields)
    return f"ALTER TABLE {table} ADD COLUMNS ({adds})"


def widen_column_sql(table: str, col: str, new_type: T.DataType) -> str:
    """Type-widening evolution (ParquetSnapshotTable._widen_type analog):
    Iceberg natively supports int->long / float->double promotion as a
    metadata-only ALTER — old data files are read under the widened type."""
    return f"ALTER TABLE {table} ALTER COLUMN {col} TYPE {new_type.simpleString()}"


def _catalog_and_ident(table: str) -> tuple[str, str]:
    """Iceberg procedures are CALL'd on the CATALOG: ``cat.db.t`` →
    (``cat``, ``db.t``); an unqualified ``db.t`` uses the session catalog."""
    parts = table.split(".")
    if len(parts) >= 3:
        return parts[0], ".".join(parts[1:])
    return "spark_catalog", table


def time_travel_sql(table: str, version: int) -> str:
    """Snapshot read (ParquetSnapshotTable.read(version=) analog). Iceberg's
    ``VERSION AS OF`` takes a snapshot id — the engine's integer table
    version maps onto it (both are 'the state after commit N')."""
    return f"SELECT * FROM {table} VERSION AS OF {version}"


def modified_since_sql(table: str, since_seq: int, version: int | None = None) -> str:
    """Incremental export (ParquetSnapshotTable.modified_since analog):
    live rows whose winning version's ``_seq`` is at/past the cutoff, read
    on the current (or AS-OF) snapshot so it works past changelog
    retention. Iceberg needs no zone-map bookkeeping — the ``_seq``
    predicate pushes down to per-file column stats in the manifests, so
    untouched data files are pruned at planning time (the built-in analog
    of the parquet sink's ``bucket_zones``)."""
    src = f"{table} VERSION AS OF {version}" if version is not None else table
    return (
        f"SELECT * FROM {src} WHERE _op <> 'D' AND _seq >= {int(since_seq)}"
    )


def history_sql(table: str) -> str:
    """Commit log (history() analog): snapshots oldest-first for display.
    (Programmatic newest-first resolution uses the parent-id ancestry walk
    in ``_summary_value`` — ids are random, so this ORDER BY is display
    order only, not a correctness tiebreak.)"""
    return (
        f"SELECT snapshot_id, committed_at, operation, summary FROM "
        f"{table}.snapshots ORDER BY committed_at ASC, snapshot_id ASC"
    )


def changelog_sql(table: str, start_snapshot: int, end_snapshot: int,
                  keys: list[str] | None = None) -> tuple[str, str]:
    """Changelog read (changes_between analog): Iceberg's
    ``create_changelog_view`` procedure + the SELECT over the view it
    registers. ``net_changes => true`` collapses a multi-snapshot range to
    its NET effect (insert-then-delete inside the range emits nothing) —
    the same contract ParquetSnapshotTable.changes_between computes with
    its two-endpoint full-outer join. Option keys are Iceberg's real read
    options ``start-snapshot-id`` (exclusive) / ``end-snapshot-id``
    (inclusive) — r3 code review caught earlier invented names that Iceberg
    would silently ignore (scanning ALL history).

    Contract difference, stated honestly: net-changes mode is mutually
    exclusive with ``identifier_columns`` in Iceberg, so an updated key
    surfaces as a DELETE(old)+INSERT(new) pair on the same key rather than
    the parquet sink's single pre-paired 'U' row — same net information;
    consumers pair on the key. ``keys`` is accepted for signature parity
    and unused. Returns (CALL sql, SELECT sql)."""
    del keys  # net_changes and identifier_columns are mutually exclusive
    cat, ident = _catalog_and_ident(table)
    view = f"{ident.replace('.', '_')}_changes"
    opts = (
        f"options => map('start-snapshot-id','{start_snapshot}',"
        f"'end-snapshot-id','{end_snapshot}')"
    )
    call = (
        f"CALL {cat}.system.create_changelog_view(table => '{ident}', "
        f"{opts}, net_changes => true, changelog_view => '{view}')"
    )
    select = (
        f"SELECT *, CASE _change_type WHEN 'INSERT' THEN 'I' "
        f"WHEN 'DELETE' THEN 'D' ELSE 'U' END AS change_op "
        f"FROM {view} WHERE _change_type <> 'UPDATE_BEFORE'"
    )
    return call, select


def timestamp_travel_sql(table: str, ts_ms: int) -> str:
    """read_as_of analog — Spark/Iceberg time travel by wall-clock."""
    return f"SELECT * FROM {table} TIMESTAMP AS OF timestamp_millis({int(ts_ms)})"


def create_tag_sql(table: str, name: str, snapshot_id: int | None = None) -> str:
    """create_tag analog — a named ref pinning a snapshot outside the
    expiration window (Iceberg SQL-extension DDL)."""
    as_of = f" AS OF VERSION {int(snapshot_id)}" if snapshot_id is not None else ""
    return f"ALTER TABLE {table} CREATE TAG `{name}`{as_of}"


def drop_tag_sql(table: str, name: str) -> str:
    return f"ALTER TABLE {table} DROP TAG `{name}`"


def tag_read_sql(table: str, name: str) -> str:
    """read(tag=) analog: VERSION AS OF accepts a ref name."""
    return f"SELECT * FROM {table} VERSION AS OF '{name}'"


def rollback_sql(table: str, snapshot_id: int) -> str:
    """rollback(version) analog: restore the table to a past snapshot as a
    metadata-only operation (Iceberg keeps the forward snapshots for audit
    exactly like the parquet sink keeps its history manifests)."""
    cat, ident = _catalog_and_ident(table)
    return (
        f"CALL {cat}.system.rollback_to_snapshot(table => '{ident}', "
        f"snapshot_id => {int(snapshot_id)})"
    )


def compact_sql(table: str, zorder_by: list[str] | None = None) -> str:
    """compact() analog: bin-pack small files (and MOR delete files) back
    into full-size data files. With ``zorder_by``, the native sort
    strategy's zorder transform — the same Morton-curve layout
    ``ParquetSnapshotTable.compact(zorder_by=)`` computes by hand
    (functions/zorder.py), done Iceberg-side."""
    cat, ident = _catalog_and_ident(table)
    if zorder_by:
        cols = ",".join(zorder_by)
        return (
            f"CALL {cat}.system.rewrite_data_files(table => '{ident}', "
            f"strategy => 'sort', sort_order => 'zorder({cols})')"
        )
    return (
        f"CALL {cat}.system.rewrite_data_files(table => '{ident}', "
        f"strategy => 'binpack')"
    )


def expire_snapshots_sql(table: str, retain_last: int) -> str:
    """expire_snapshots(keep=) analog: drop snapshot metadata + orphaned
    data files older than the retained window."""
    cat, ident = _catalog_and_ident(table)
    return (
        f"CALL {cat}.system.expire_snapshots(table => '{ident}', "
        f"retain_last => {retain_last})"
    )


def remove_orphans_sql(table: str, older_than_ts: str | None = None) -> str:
    """vacuum() analog: delete files under the table location that no
    snapshot references (crashed-writer leftovers). ``older_than_ts`` is the
    grace bound (ISO timestamp) protecting in-flight writers — same default
    rationale as ParquetSnapshotTable.vacuum(grace_seconds)."""
    cat, ident = _catalog_and_ident(table)
    older = f", older_than => TIMESTAMP '{older_than_ts}'" if older_than_ts else ""
    return (
        f"CALL {cat}.system.remove_orphan_files(table => '{ident}'{older})"
    )


def rebucket_sql(table: str, old_n_buckets: int, new_n_buckets: int,
                 col: str = "path") -> str:
    """rebucket() analog: layout evolution without a rewrite — Iceberg
    partition-spec evolution applies the new bucketing to FUTURE writes
    (compaction migrates old files incrementally; the snapshot table's
    rebucket() rewrites eagerly instead because its manifest has no
    per-file spec tracking)."""
    return (
        f"ALTER TABLE {table} REPLACE PARTITION FIELD "
        f"bucket({old_n_buckets}, {col}) WITH bucket({new_n_buckets}, {col})"
    )


def file_stats_sql(table: str) -> str:
    """Inputs for the maintenance planner, from the ``files`` metadata table
    (a metadata-only scan — no data files touched): live file count, total
    bytes and mean file size."""
    return (
        f"SELECT count(*) AS n_files, "
        f"coalesce(sum(file_size_in_bytes), 0) AS total_bytes, "
        f"coalesce(avg(file_size_in_bytes), 0) AS avg_bytes "
        f"FROM {table}.files"
    )


def snapshot_count_sql(table: str) -> str:
    """Snapshot count for the expiration decision (metadata-only)."""
    return f"SELECT count(*) AS n_snapshots FROM {table}.snapshots"


def write_mode_sql(table: str, mode: str) -> str:
    """ParquetSnapshotTable write_mode ('cow'/'mor') analog: Iceberg's
    row-level-operation modes are table properties."""
    m = {"cow": "copy-on-write", "mor": "merge-on-read"}[mode]
    return (
        f"ALTER TABLE {table} SET TBLPROPERTIES ("
        f"'write.merge.mode' = '{m}', 'write.update.mode' = '{m}', "
        f"'write.delete.mode' = '{m}')"
    )


def wap_enable_sql(table: str) -> str:
    """Write-audit-publish prerequisite: snapshots written under a WAP
    branch stay invisible to main until fast-forwarded."""
    return f"ALTER TABLE {table} SET TBLPROPERTIES ('write.wap.enabled' = 'true')"


def create_branch_sql(table: str, name: str) -> str:
    """The staging ref for branch-based WAP (Iceberg snapshot branch)."""
    return f"ALTER TABLE {table} CREATE BRANCH `{name}`"


def drop_branch_sql(table: str, name: str) -> str:
    return f"ALTER TABLE {table} DROP BRANCH `{name}`"


def branch_read_sql(table: str, name: str) -> str:
    """The audit surface: read the staged branch head (read_staged analog)."""
    return f"SELECT * FROM {table} VERSION AS OF '{name}'"


def fast_forward_sql(table: str, to_branch: str, from_branch: str = "main") -> str:
    """publish() analog: fast-forward main to the staged branch head — one
    metadata-only operation exposing every staged snapshot atomically."""
    cat, ident = _catalog_and_ident(table)
    return (
        f"CALL {cat}.system.fast_forward(table => '{ident}', "
        f"branch => '{from_branch}', to => '{to_branch}')"
    )


def delete_where_sql(table: str, predicate: str, seq: int) -> str:
    """delete_where analog. NOT a bare ``DELETE FROM``: the engine's rows
    carry (_seq, _op) and a physical delete would forget the key entirely —
    a late log straggler (lower sequence) would then re-insert it through
    the NOT MATCHED arm. Writing a TOMBSTONE (_op='D' at one sequence past
    the committed max) keeps LWW protection, exactly like the parquet
    sink's delete_where; read()/read_tag() already filter _op <> 'D'."""
    return (
        f"UPDATE {table} SET _op = 'D', _seq = {int(seq)} "
        f"WHERE ({predicate}) AND _op <> 'D'"
    )


def update_where_sql(table: str, assignments: dict, predicate: str, seq: int) -> str:
    """update_where analog: assign the requested columns and restamp the row
    at one sequence past the committed max so the update outranks every
    stored version (and loses to any later log event, same total order)."""
    sets = ", ".join(f"{c} = {e}" for c, e in assignments.items())
    return (
        f"UPDATE {table} SET {sets}, _seq = {int(seq)}, _op = 'U' "
        f"WHERE ({predicate}) AND _op <> 'D'"
    )


def merge_into_sql(
    table: str,
    keys: list[str],
    table_cols: list[str],
    seq: int,
    *,
    update_assignments: dict | None = None,
    update_condition: str | None = None,
    when_matched_delete: bool = False,
    delete_condition: str | None = None,
    insert_assignments: dict | None = None,
    insert_condition: str | None = None,
) -> str:
    """Generic multi-clause MERGE (the Iceberg twin of
    ``ParquetSnapshotTable.merge_into``): ordered WHEN arms, first match
    wins per row — delete, then update, exactly the lake verb's fixed
    clause order. Assignments are SQL exprs over ``s.``/``t.`` (update) or
    ``s.`` (insert); ``table_cols`` includes the internal ``_seq``/``_op``.

    Two sink-model translations:

    - the lake matches against LIVE rows; here a deleted key physically
      exists as a tombstone, so every matched arm requires ``t._op <> 'D'``
      and the insert clause gains a RESURRECT arm (matched tombstone →
      UPDATE to the insert image at the new sequence) so a source row for a
      deleted key inserts on both sinks.
    - duplicate source key groups: Iceberg's MERGE itself raises on
      multiple source rows matching one target row (the lake guard's
      native equivalent); INSERT-side duplicates must be pre-asserted by
      the caller (``IcebergTable.merge_into`` does).
    """
    if update_assignments is None and not when_matched_delete \
            and insert_assignments is None:
        raise ValueError("merge_into needs at least one clause")
    data_cols = [c for c in table_cols if not c.startswith("_")]
    for which, assigned in (("update", update_assignments), ("insert", insert_assignments)):
        for c in (assigned or {}):
            if c in keys:
                raise ValueError(f"merge_into {which} cannot assign key column {c!r}")
            if c not in data_cols:
                raise ValueError(f"merge_into {which} targets unknown column {c!r}")
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    arms: list[str] = []
    live = "t._op <> 'D'"
    if when_matched_delete:
        cond = f"{live} AND ({delete_condition})" if delete_condition else live
        nulls = ", ".join(f"t.{c} = NULL" for c in data_cols if c not in keys)
        sets = f"t._op = 'D', t._seq = {int(seq)}" + (f", {nulls}" if nulls else "")
        arms.append(f"WHEN MATCHED AND {cond} THEN UPDATE SET {sets}")
    if update_assignments is not None:
        cond = f"{live} AND ({update_condition})" if update_condition else live
        sets = ", ".join(f"t.{c} = {e}" for c, e in update_assignments.items())
        sets = (f"{sets}, " if sets else "") + f"t._seq = {int(seq)}, t._op = 'U'"
        arms.append(f"WHEN MATCHED AND {cond} THEN UPDATE SET {sets}")
    if insert_assignments is not None:
        image = {
            c: (f"s.{c}" if c in keys else insert_assignments.get(c, "NULL"))
            for c in data_cols
        }
        # resurrect arm: a tombstoned key is "not matched" in lake terms
        rcond = "t._op = 'D'" + (f" AND ({insert_condition})" if insert_condition else "")
        rsets = ", ".join(f"t.{c} = {e}" for c, e in image.items() if c not in keys)
        rsets = (f"{rsets}, " if rsets else "") + f"t._seq = {int(seq)}, t._op = 'I'"
        arms.append(f"WHEN MATCHED AND {rcond} THEN UPDATE SET {rsets}")
        icond = f" AND ({insert_condition})" if insert_condition else ""
        cols = ", ".join([*image, "_seq", "_op"])
        vals = ", ".join([*image.values(), str(int(seq)), "'I'"])
        arms.append(f"WHEN NOT MATCHED{icond} THEN INSERT ({cols}) VALUES ({vals})")
    return f"MERGE INTO {table} t USING _merge_src s ON {on} " + " ".join(arms)


def next_seq_sql(table: str) -> str:
    """Driver-side next-sequence probe for the DML verbs (parquet-stats-
    backed max aggregate; no shuffle)."""
    return f"SELECT coalesce(max(_seq), -1) + 1 AS next_seq FROM {table}"


def merge_sql(table: str, keys: list[str], batch_cols: list[str], table_cols: list[str]) -> str:
    """The sequence-aware LWW MERGE.

    - matched + outranked → UPDATE sets EVERY table column: columns absent
      from the batch are nulled, matching ParquetSnapshotTable, whose winning
      row replaces the old row wholesale (schema-evolved winners must not
      keep stale values from the loser).
    - tiebreak ``s._op >= t._op`` is string order U > I > D — the same total
      order as lake._rank, and idempotent on exact replays (>= re-applies the
      identical row).
    """
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    set_clause = ", ".join(
        f"t.{c} = s.{c}" if c in batch_cols else f"t.{c} = NULL"
        for c in table_cols
        if c not in keys
    )
    insert_cols = ", ".join(batch_cols)
    insert_vals = ", ".join(f"s.{c}" for c in batch_cols)
    return (
        f"MERGE INTO {table} t USING _merge_src s ON {on} "
        f"WHEN MATCHED AND (s._seq > t._seq OR (s._seq = t._seq AND s._op >= t._op)) "
        f"THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


def patch_merge_sql(
    table: str,
    keys: list[str],
    batch_cols: list[str],
    table_cols: list[str],
    patch_cols: list[str],
    absolute_col: str | None = None,
) -> str:
    """Partial-image MERGE (operators/patch.py semantics, Iceberg-side).

    The source is the batch-local normalization
    (``normalize_patches(use_baseline=False, emit_absolute=True)``) reduced
    to one image per key by the batch LWW; the TARGET ROW is the carry
    baseline, folded in by the MERGE itself — no second table read, and no
    read-then-write race under Iceberg's optimistic concurrency (a
    conflicting commit retries the whole MERGE against the new snapshot).
    A matched U does NOT coalesce when the target row is a tombstone
    (``t._op = 'D'``: the delete reset the patch base — dead values must
    not resurrect) or when the source image is ABSOLUTE (``absolute_col``
    true: the in-batch chain contained an I/D, so its NULLs are real).

    - matched U with a NULL patch column keeps the target value
      (``COALESCE(s.c, t.c)`` — "NULL means unchanged");
    - matched non-patch columns follow full-image semantics (``s.c`` / NULL
      for batch-absent table columns), exactly like ``merge_sql``;
    - D rows tombstone via ``_op='D'`` update, NOT a physical DELETE — a
      late straggler must still lose LWW against the tombstone's sequence —
      and null every non-key column (delete resets the patch base).
    """
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    coalesce_guard = "s._op = 'U' AND t._op <> 'D'"
    if absolute_col is not None:
        coalesce_guard += f" AND s.{absolute_col} = FALSE"
    sets = []
    for c in table_cols:
        if c in keys:
            continue
        if c.startswith("_"):
            # internal LWW columns (_seq/_op) always follow the source row
            sets.append(f"t.{c} = s.{c}")
        elif c in patch_cols and c in batch_cols:
            sets.append(f"t.{c} = CASE WHEN s._op = 'D' THEN NULL "
                        f"WHEN {coalesce_guard} THEN COALESCE(s.{c}, t.{c}) "
                        f"ELSE s.{c} END")
        elif c in batch_cols:
            sets.append(f"t.{c} = CASE WHEN s._op = 'D' THEN NULL ELSE s.{c} END")
        else:
            sets.append(f"t.{c} = NULL")
    set_clause = ", ".join(sets)
    ins = [c for c in batch_cols if c != absolute_col]
    insert_cols = ", ".join(ins)
    insert_vals = ", ".join(f"s.{c}" for c in ins)
    return (
        f"MERGE INTO {table} t USING _merge_src s ON {on} "
        f"WHEN MATCHED AND (s._seq > t._seq OR (s._seq = t._seq AND s._op >= t._op)) "
        f"THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})"
    )


class IcebergTable(LakeTable):
    """Keyed MERGE INTO an Iceberg table with a lineage side table."""

    GUARD_PREFIX = "last-batch."
    STATE_PREFIX = "job-state."

    def __init__(self, spark: SparkSession, table: str, *, keys: list[str] | None = None) -> None:
        if not iceberg_available(spark):
            raise SinkCommitError(
                "Iceberg runtime not on the classpath — use ParquetSnapshotTable "
                "(this sandbox has no Iceberg jar; see SURVEY.md §5)"
            )
        self.spark = spark
        self.table = table
        self.keys = keys or ["repo", "path", "commit"]
        self.lineage_table = f"{table}_lineage"

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def ensure(self, schema: T.StructType) -> None:
        if not self.exists():
            self.spark.sql(ensure_sql(self.table, schema))
        if not self.spark.catalog.tableExists(self.lineage_table):
            from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in ParquetSnapshotTable.LINEAGE_SCHEMA.fields
            )
            self.spark.sql(f"CREATE TABLE {self.lineage_table} ({ddl}) USING iceberg")

    def read(self, version: int | None = None,
             timestamp_ms: int | None = None) -> DataFrame:
        """Table state; ``version`` (a snapshot id) time-travels via
        ``VERSION AS OF`` — the ParquetSnapshotTable.read(version=) drop-in.
        ``timestamp_ms`` travels by wall-clock (``TIMESTAMP AS OF``, the
        read_as_of drop-in)."""
        if version is not None and timestamp_ms is not None:
            raise SinkCommitError("pass version= or timestamp_ms=, not both")
        if timestamp_ms is not None:
            df = self.spark.sql(timestamp_travel_sql(self.table, timestamp_ms))
        elif version is not None:
            df = self.spark.sql(time_travel_sql(self.table, version))
        else:
            df = self.spark.table(self.table)
        return df.where(F.col("_op") != "D").drop("_seq", "_op")

    def modified_since(self, since_seq: int, version: int | None = None) -> DataFrame:
        """Incremental export drop-in for ParquetSnapshotTable.modified_since:
        winners at/past ``since_seq`` on the current (or AS-OF) snapshot.
        File pruning comes free from manifest column stats on ``_seq``."""
        return self.spark.sql(
            modified_since_sql(self.table, since_seq, version)
        ).drop("_seq", "_op")

    def read_lineage(self) -> DataFrame:
        return self.spark.table(self.lineage_table)

    def truncate(self) -> None:
        self.spark.sql(f"DELETE FROM {self.table}")

    # ---- snapshot services (ParquetSnapshotTable maintenance drop-ins) ----

    def history(self) -> list[dict]:
        """Commit log, oldest first — snapshot id, timestamp, operation and
        summary (where the exactly-once guard properties live)."""
        return [r.asDict() for r in self.spark.sql(history_sql(self.table)).collect()]

    def current_snapshot_id(self) -> int | None:
        h = self.history()
        return int(h[-1]["snapshot_id"]) if h else None

    def changes_between(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Net row-level changes between two snapshots (``change_op``
        I/U/D), same consumer contract as ParquetSnapshotTable
        .changes_between: both endpoints read as snapshots → the feed is
        exactly-once per version pair. ``v_from`` is EXCLUSIVE start (the
        consumer's last-seen snapshot), matching the snapshot table's
        'changes since version N' semantics."""
        if v_to is None:
            v_to = self.current_snapshot_id()
            if v_to is None:
                raise SinkCommitError(f"{self.table} has no snapshots")
        call, select = changelog_sql(self.table, v_from, v_to, keys=self.keys)
        self.spark.sql(call)
        return self.spark.sql(select)

    def create_tag(self, name: str, snapshot_id: int | None = None) -> None:
        """Pin a snapshot under a stable name (exempt from expire_snapshots
        until dropped — ParquetSnapshotTable.create_tag parity)."""
        self.spark.sql(create_tag_sql(self.table, name, snapshot_id))

    def drop_tag(self, name: str) -> None:
        self.spark.sql(drop_tag_sql(self.table, name))

    def read_tag(self, name: str) -> DataFrame:
        return (
            self.spark.sql(tag_read_sql(self.table, name))
            .where(F.col("_op") != "D")
            .drop("_seq", "_op")
        )

    def rollback(self, snapshot_id: int) -> None:
        """Restore the table to a past snapshot (metadata-only; forward
        snapshots retained for audit — ParquetSnapshotTable.rollback
        parity). The batch guard rides the snapshot summary, so guard
        entries committed after the target snapshot vanish with the
        rollback and replay re-applies those batches, same as the parquet
        sink."""
        self.spark.sql(rollback_sql(self.table, snapshot_id))

    def compact(self, *, zorder_by: list[str] | None = None) -> None:
        """Bin-pack small files (the inline-compaction analog; run it on the
        cadence MOR delta pressure demands). ``zorder_by`` rewrites along
        the Morton curve via the native sort strategy — the
        ``ParquetSnapshotTable.compact(zorder_by=)`` drop-in, including the
        persistence contract: the columns stamp the ``zorder_by`` table
        property, later plain ``compact()`` calls default to it (scheduled
        maintenance keeps the layout), ``zorder_by=[]`` clears it."""
        if zorder_by is not None:
            if zorder_by:
                cols = ",".join(zorder_by)
                self.spark.sql(
                    f"ALTER TABLE {self.table} SET TBLPROPERTIES "
                    f"('zorder_by' = '{cols}')"
                )
            else:
                self.spark.sql(
                    f"ALTER TABLE {self.table} UNSET TBLPROPERTIES "
                    f"IF EXISTS ('zorder_by')"
                )
                zorder_by = None
        else:
            stored = {
                r["key"]: r["value"]
                for r in self.spark.sql(
                    f"SHOW TBLPROPERTIES {self.table}"
                ).collect()
            }.get("zorder_by")
            zorder_by = [c for c in stored.split(",") if c] if stored else None
        self.spark.sql(compact_sql(self.table, zorder_by=zorder_by or None))

    def expire_snapshots(self, retain_last: int) -> None:
        if retain_last < 1:
            raise SinkCommitError(f"retain_last must be >= 1, got {retain_last}")
        self.spark.sql(expire_snapshots_sql(self.table, retain_last))

    # ---- write-audit-publish (ParquetSnapshotTable WAP drop-ins) ----------
    # Iceberg's branch-based WAP: writes under spark.wap.branch land on a
    # staging branch; main is untouched until fast_forward. The session conf
    # is the staging switch (Iceberg's design — the writer stays unchanged),
    # so stage/unstage wrap the job rather than each merge call.

    def stage_to_branch(self, branch: str = "audit") -> None:
        """Open a WAP chain: enable WAP, create the staging branch, and route
        this session's writes to it (merge(staged=True) analog)."""
        self.spark.sql(wap_enable_sql(self.table))
        self.spark.sql(create_branch_sql(self.table, branch))
        self.spark.conf.set("spark.wap.branch", branch)

    def read_staged(self, branch: str = "audit") -> DataFrame:
        return (
            self.spark.sql(branch_read_sql(self.table, branch))
            .where(F.col("_op") != "D")
            .drop("_seq", "_op")
        )

    def publish(self, branch: str = "audit") -> None:
        """Fast-forward main to the staged branch head (publish() analog),
        then stop routing writes to the branch."""
        self.spark.sql(fast_forward_sql(self.table, branch))
        self.spark.conf.unset("spark.wap.branch")
        self.spark.sql(drop_branch_sql(self.table, branch))

    def abort_staged(self, branch: str = "audit") -> None:
        """Drop the staging branch unmerged (abort_staged analog): main never
        saw the staged snapshots; their files expire with the branch."""
        self.spark.conf.unset("spark.wap.branch")
        self.spark.sql(drop_branch_sql(self.table, branch))

    # ---- row-level DML verbs (ParquetSnapshotTable.delete_where/update_where
    # drop-ins; see delete_where_sql for why these tombstone, not DELETE) ----

    def _next_seq(self) -> int:
        return int(
            self.spark.sql(next_seq_sql(self.table)).collect()[0]["next_seq"]
        )

    def delete_where(self, predicate: str) -> None:
        self.spark.sql(delete_where_sql(self.table, predicate, self._next_seq()))

    def update_where(self, assignments: dict, predicate: str) -> None:
        bad = [c for c in assignments if c in self.keys or c.startswith("_")]
        if bad:
            raise SinkCommitError(
                f"update_where cannot assign key/internal columns {bad}"
            )
        self.spark.sql(
            update_where_sql(self.table, assignments, predicate, self._next_seq())
        )

    def merge_into(
        self,
        source: DataFrame,
        *,
        when_matched_update: dict | str | None = None,
        update_condition: str | None = None,
        when_matched_delete: bool = False,
        delete_condition: str | None = None,
        when_not_matched_insert: dict | str | None = None,
        insert_condition: str | None = None,
    ) -> None:
        """``ParquetSnapshotTable.merge_into`` drop-in over the native
        MERGE (``merge_into_sql``). ``'all'`` normalizes exactly like the
        lake verb: source columns present in the table, by name. Duplicate
        source key groups are pre-asserted (Iceberg's MERGE only catches
        matched-side duplicates natively; insert-side dupes would land
        twice) — rejected BEFORE the MERGE runs, so nothing commits."""
        # same clause validation as the lake verb — a condition without its
        # clause must error identically on both sinks, not silently merge
        for cond, clause_on, name in (
            (update_condition, when_matched_update is not None, "update_condition"),
            (delete_condition, when_matched_delete, "delete_condition"),
            (insert_condition, when_not_matched_insert is not None, "insert_condition"),
        ):
            if cond is not None and not clause_on:
                raise SinkCommitError(f"merge_into: {name} given without its clause")
        table_cols = [f.name for f in self.spark.table(self.table).schema.fields]
        data_cols = [c for c in table_cols if not c.startswith("_")]

        def _norm(clause):
            if clause == "all":
                return {
                    c: f"s.{c}" for c in data_cols
                    if c not in self.keys and c in source.columns
                }
            return dict(clause)

        update = _norm(when_matched_update) if when_matched_update is not None else None
        insert = _norm(when_not_matched_insert) if when_not_matched_insert is not None else None
        missing = [k for k in self.keys if k not in source.columns]
        if missing:
            raise SinkCommitError(f"merge_into source missing key columns {missing}")
        try:
            sql = merge_into_sql(
                self.table, self.keys, table_cols, self._next_seq(),
                update_assignments=update, update_condition=update_condition,
                when_matched_delete=when_matched_delete,
                delete_condition=delete_condition,
                insert_assignments=insert, insert_condition=insert_condition,
            )
        except ValueError as e:
            raise SinkCommitError(str(e)) from e
        # pin the source BEFORE the dup pre-assert: the MERGE re-evaluates
        # the temp view, so without pinning a nondeterministic source could
        # pass the guard and still produce insert-side duplicates in the
        # MERGE's own evaluation (TOCTOU). localCheckpoint computes the
        # source exactly once; an executor loss afterwards fails the job
        # loudly instead of recomputing a different batch.
        source = source.localCheckpoint(eager=True)
        dup = (
            source.groupBy(*self.keys).count().where(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise SinkCommitError(
                "merge_into rejected: the source has multiple rows for one "
                "key group (ambiguous merge) — nothing was committed"
            )
        source.createOrReplaceTempView("_merge_src")
        self.spark.sql(sql)

    def rebucket(self, old_n_buckets: int, new_n_buckets: int) -> None:
        """Partition-spec evolution: new writes use the new bucket count;
        existing files keep the old spec until compaction rewrites them."""
        if new_n_buckets < 1:
            raise SinkCommitError(f"n_buckets must be >= 1, got {new_n_buckets}")
        self.spark.sql(rebucket_sql(self.table, old_n_buckets, new_n_buckets))

    def set_write_mode(self, mode: str) -> None:
        """'cow' or 'mor' — the write-amplification control, as Iceberg
        row-level-operation table properties."""
        if mode not in ("cow", "mor"):
            raise SinkCommitError(f"write mode must be 'cow' or 'mor', got {mode!r}")
        self.spark.sql(write_mode_sql(self.table, mode))

    def plan_maintenance(
        self,
        *,
        target_file_mb: int = 256,
        expire_slack: int = 64,
        retain_last: int = 8,
    ) -> dict:
        """ParquetSnapshotTable.plan_maintenance parity, from Iceberg's own
        metadata tables (metadata-only scans, no data files touched):
        compaction is due when the mean live data file is under half the
        target size (the small-files signal rewrite_data_files exists for);
        expiration when the snapshot count exceeds ``retain_last`` by more
        than ``expire_slack``."""
        f = self.spark.sql(file_stats_sql(self.table)).collect()[0]
        s = self.spark.sql(snapshot_count_sql(self.table)).collect()[0]
        avg_mb = float(f["avg_bytes"]) / (1024 * 1024)
        return {
            "compact": f["n_files"] > 1 and avg_mb < target_file_mb / 2,
            "n_files": int(f["n_files"]),
            "avg_file_mb": round(avg_mb, 2),
            "expire": int(s["n_snapshots"]) > retain_last + expire_slack,
            "n_snapshots": int(s["n_snapshots"]),
        }

    def optimize(self, *, retain_last: int = 8, **plan_kwargs) -> dict:
        """Run whatever plan_maintenance says is due (drop-in parity with
        the snapshot table's optimize; rebucketing is intentionally absent —
        Iceberg partition-spec evolution is a DDL decision, not a
        size-triggered one). Safe to cron: both procedures are no-op-cheap
        when nothing qualifies."""
        plan = self.plan_maintenance(retain_last=retain_last, **plan_kwargs)
        actions: dict = {}
        if plan["compact"]:
            self.compact()
            actions["compact"] = True
        if plan["expire"]:
            self.expire_snapshots(retain_last)
            actions["expired_to_retain_last"] = retain_last
        return {"plan": plan, "actions": actions}

    # ---- guard / state via snapshot summary properties ---------------------

    def _summary_value(self, key: str) -> str | None:
        """Latest snapshot-summary value for ``key`` (None if never set).

        Ordered by the PARENT-ID ANCESTRY CHAIN, not committed_at:
        committed_at is millisecond-grained and Iceberg snapshot ids are
        random longs (NOT monotonic — r3 code review caught an id-based
        tiebreak here that could resolve same-ms commits to the OLDER
        snapshot and re-merge an already-committed batch). The chain tip is
        the snapshot no other snapshot names as parent; walking parent_id
        from there visits newest→oldest exactly. Expired ancestors just end
        the walk; if retained branches leave several tips (rollback), the
        latest-committed tip wins."""
        try:
            rows = self.spark.sql(
                f"SELECT snapshot_id, parent_id, committed_at, summary "
                f"FROM {self.table}.snapshots"
            ).collect()
        except Exception:
            return None
        by_id = {r["snapshot_id"]: r for r in rows}
        parents = {r["parent_id"] for r in rows if r["parent_id"] is not None}
        tips = [r for r in rows if r["snapshot_id"] not in parents]
        cur = max(tips, key=lambda r: r["committed_at"]) if tips else None
        seen: set = set()
        while cur is not None and cur["snapshot_id"] not in seen:
            seen.add(cur["snapshot_id"])
            s = cur["summary"]
            if s and key in s:
                return s[key]
            cur = by_id.get(cur["parent_id"])
        return None

    def last_committed_batch(self, job: str) -> int | None:
        v = self._summary_value(f"{self.GUARD_PREFIX}{job}")
        return int(v) if v is not None else None

    def job_state(self, job: str) -> dict:
        v = self._summary_value(f"{self.STATE_PREFIX}{job}")
        return json.loads(v) if v else {}

    def merge(
        self,
        batch_df: DataFrame,
        *,
        job: str = "default",
        batch_id: int = 0,
        counts: LineageCounts | None = None,
        job_state: dict | None = None,
        properties: dict | None = None,
        finalize=None,
        patch: bool = False,
        patch_cols: list[str] | None = None,
    ) -> MergeResult:
        last = self.last_committed_batch(job)
        if last is not None and batch_id <= last:
            return MergeResult(applied=False, version=-1, skipped_reason=f"batch<=last({last})")
        if patch:
            # partial-image feed: batch-local carry-forward only — the MERGE
            # itself folds the target baseline via patch_merge_sql's guarded
            # COALESCE (no second table read; no read-then-write race under
            # optimistic concurrency). ``_abs`` marks images whose in-batch
            # chain hit an I/D (authoritative — never coalesced).
            from wprdc_etl_spark.operators.patch import normalize_patches

            self._patch_cols = list(patch_cols) if patch_cols is not None else None
            batch_df = normalize_patches(
                self, batch_df, patch_cols, use_baseline=False, emit_absolute=True
            )
        # schema evolution (B9): additive columns append; shared columns may
        # widen (int->long, float->double — Iceberg-native metadata-only
        # promotion), same lattice the parquet sink enforces in _widen_type
        table_fields = {
            f.name: f.dataType for f in self.spark.table(self.table).schema.fields
        }
        new_cols = [
            f for f in batch_df.schema.fields
            if f.name not in table_fields
            and f.name not in ("op", "event_sequence", "event_ts")
            and not f.name.startswith("_")  # engine-internal (_abs etc.)
        ]
        if new_cols:
            self.spark.sql(evolve_sql(self.table, new_cols))
        for f in batch_df.schema.fields:
            cur = table_fields.get(f.name)
            if cur is None or f.name in ("op", "event_sequence", "event_ts"):
                continue
            if cur != f.dataType:
                widened = _widen_type(f.name, cur, f.dataType)
                if widened != cur:
                    self.spark.sql(widen_column_sql(self.table, f.name, widened))
        # batch-local LWW with the same hash-aggregate the snapshot table uses
        shaped = (
            batch_df.withColumn("_seq", F.col("event_sequence").cast("long"))
            .withColumn("_op", F.col("op"))
            .drop("op", "event_sequence", "event_ts")
        )
        reduced = _lww_reduce(shaped, self.keys).persist()
        try:
            stats = reduced.agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("_op") == "D", 1).otherwise(0)).alias("n_del"),
                F.max("_seq").alias("max_seq"),
            ).collect()[0]
            if finalize is not None:
                counts, job_state = finalize()
            counts = counts or LineageCounts()
            reduced.createOrReplaceTempView("_merge_src")
            table_cols = [
                c for c in self.spark.table(self.table).columns if c not in ("_seq", "_op")
            ] + ["_seq", "_op"]
            if patch:
                pcols = self._patch_cols if self._patch_cols is not None else [
                    c for c in reduced.columns
                    if c not in self.keys and not c.startswith("_")
                ]
                sql = patch_merge_sql(
                    self.table, self.keys, list(reduced.columns), table_cols,
                    patch_cols=pcols, absolute_col="_abs",
                )
            else:
                sql = merge_sql(self.table, self.keys, list(reduced.columns), table_cols)
            # guard + state ride the MERGE snapshot itself (atomic commit):
            # Iceberg copies any `snapshot-property.*` session conf into the
            # snapshot summary at commit time
            props = {f"snapshot-property.{self.GUARD_PREFIX}{job}": str(batch_id)}
            if job_state is not None:
                props[f"snapshot-property.{self.STATE_PREFIX}{job}"] = json.dumps(job_state)
            for k, v in props.items():
                self.spark.conf.set(k, v)
            try:
                self.spark.sql(sql)
            finally:
                for k in props:
                    self.spark.conf.unset(k)
        finally:
            reduced.unpersist()
        # post-snapshot observability (crash here loses rows of telemetry,
        # never data: the guard already committed with the merge)
        self._append_lineage(job, batch_id, stats, counts)
        if properties:
            kv = ", ".join(f"'{k}' = '{v}'" for k, v in properties.items())
            self.spark.sql(f"ALTER TABLE {self.table} SET TBLPROPERTIES ({kv})")
        return MergeResult(
            applied=True,
            version=-1,
            rows_upserted=int(stats["n"] - stats["n_del"]),
            rows_deleted=int(stats["n_del"]),
            strategy="iceberg-merge",
        )

    def _append_lineage(self, job: str, batch_id: int, stats, counts: LineageCounts) -> None:
        from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

        row = {
            "job": job,
            "batch_id": batch_id,
            "partition": -1,
            # -1 sentinel for an empty/fully-quarantined batch — parity with
            # ParquetSnapshotTable._write_lineage and lag_report's contract
            "last_seq": -1 if stats["max_seq"] is None else int(stats["max_seq"]),
            "rows_upserted": int(stats["n"] - stats["n_del"]),
            "rows_deleted": int(stats["n_del"]),
            "rows_quarantined": counts.rows_quarantined,
            "rows_late": counts.rows_late,
            "input_hash": counts.input_hash,
            "status": "success",
            "wall_ms": counts.wall_ms,
        }
        df = self.spark.createDataFrame(
            [tuple(row[f.name] for f in ParquetSnapshotTable.LINEAGE_SCHEMA.fields[:-1])],
            T.StructType(list(ParquetSnapshotTable.LINEAGE_SCHEMA.fields[:-1])),
        ).withColumn("committed_ts", F.current_timestamp())
        df.writeTo(self.lineage_table).append()
