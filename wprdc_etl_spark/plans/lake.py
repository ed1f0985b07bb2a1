"""B7/B8/B9/B10/B12 — the lake sink: keyed MERGE with exactly-once commit.

Parity map (SURVEY.md §4.2): the reference's sink is the CKAN datastore HTTP
API — ``pipeline/loaders.py``:

- ``CKANLoader.resource_exists/get_resource_id``  → ``LakeTable.exists()``
- ``CKANLoader.create_resource/create_datastore`` → ``LakeTable.ensure()``
- ``CKANLoader.delete_datastore`` (insert mode)   → ``LakeTable.truncate()``
- ``CKANLoader.upsert`` (``datastore_upsert`` with ``method='upsert'``,
  primary-key update-else-insert, server-side)    → ``LakeTable.merge()``
- ``CKANLoader.update_metadata``                  → manifest ``properties``
- SQLite ``status`` row (``pipeline/status.py``)  → ``lineage`` table inside
  the same atomic commit, + the ``committed`` batch guard (descendant of
  ``DuplicateFileException``'s checksum skip).

Two implementations share the contract:

- ``IcebergTable`` (plans/iceberg.py): thin wrapper over ``MERGE INTO`` /
  ``ALTER TABLE ADD COLUMNS`` — for real clusters with the Iceberg runtime
  jar. Cannot run in this sandbox (no jar, no network — SURVEY §5 note).
- ``ParquetSnapshotTable`` (here): copy-on-write bucketed parquet + JSON
  manifest swapped atomically via ``os.replace``. Semantically a strict
  subset of Iceberg MERGE so the two are drop-ins for each other.

Layout::

    root/
      manifest.json                  ← the ONLY mutable path (atomic rename)
      manifest.tmp.*                 ← staging for the swap
      data/v{N}/_bucket_dir={b}/part-*.parquet
      lineage/l{N}/part-*.parquet

Scale design (the part that must survive 1000 executors / 10^10 events):

- **Bucketed copy-on-write.** Rows hash into ``n_buckets`` by
  ``xxhash64(repo, path)`` — (repo, path), NOT repo alone, so the hot
  mega-repo spreads over all buckets (SURVEY §8.3 #4). A merge rewrites only
  the buckets its batch touches; a micro-batch touching 3 of 4096 buckets
  reads and rewrites ~0.07% of the table.
- **Broadcast merge for small batches.** The typical CDC micro-batch is tiny
  relative to the table, so the merge avoids shuffling current data at all:
  two broadcast hash joins against the (reduced) batch — survivors filter +
  winner resolution — then one repartition of the *affected buckets only*
  for the write. ``merge_strategy='auto'`` picks by reduced batch size.
- **Co-partitioned semi-join for bulk loads.** Backfill-sized batches
  materialize winners by semi-joining payload rows against the winner-rid
  set on (bucket, rid) with SHUFFLE_HASH: one payload exchange total, hash
  maps built per-partition on executors — no driver-side set build, nothing
  funnels through one node (measured 1.48× over the loser-broadcast path at
  20M events; lifted 2→8-thread scaling efficiency 0.65 → 0.80).
- **Tombstones.** Deletes are retained as ``_op='D'`` rows, because a
  redelivered old insert must not resurrect a deleted key: last-writer-wins
  over ``(_seq, _op)`` needs the delete's sequence number to stay visible.
  ``read()`` filters them; ``compact()`` garbage-collects them once older
  than every possible redelivery.
- **Exactly-once.** Data files and the lineage rows for a batch are written
  to *unreferenced* paths first; the single ``os.replace`` of manifest.json
  publishes both together. A crash at any point leaves the old manifest
  intact (orphans are GC'd on the next commit), and a replayed batch is
  skipped by the ``committed[job] >= batch_id`` guard — and would be a no-op
  anyway because LWW-by-sequence is idempotent (SURVEY §4.4).

Single-writer deployment: one streaming query owns a table (the reference is
likewise a single cron process per pipeline). The manifest swap makes
concurrent readers always see a consistent snapshot — and the swap is a
compare-and-swap under a short lock, so a SECOND writer racing the same
table fails with a clean ``SinkCommitError`` instead of silently dropping
the other writer's bucket updates (the optimistic-concurrency commit
protocol Iceberg uses; see ``_swap_manifest``).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import DuplicateBatchException, SinkCommitError

MANIFEST_FORMAT = "wprdc-etl-spark/parquet-snapshot/v1"
INTERNAL_COLS = ["_seq", "_op"]
# names the engine claims for itself inside write/merge plans — a user
# column with one of these would be silently clobbered or dropped (e.g.
# _clustered drops _zkey after the layout sort), so they are rejected at
# create time and at additive evolution
RESERVED_COLS = ("_seq", "_op", "_bucket_dir", "_zkey", "_rid")
DEFAULT_KEYS = ["repo", "path", "commit"]


@dataclass
class MergeResult:
    applied: bool
    version: int
    rows_upserted: int = 0
    rows_deleted: int = 0
    n_affected_buckets: int = 0
    strategy: str = ""
    skipped_reason: str = ""
    rebased: bool = False  # commit landed via optimistic rebase onto a newer head


@dataclass
class LineageCounts:
    """Job-layer counts attached to the commit (FIXTURES.md §4)."""

    rows_quarantined: int = 0
    rows_late: int = 0
    input_hash: str = ""
    wall_ms: int = 0
    extra: dict = field(default_factory=dict)


class LakeTable(ABC):
    """The sink contract both implementations satisfy."""

    @abstractmethod
    def exists(self) -> bool: ...

    @abstractmethod
    def ensure(self, schema: T.StructType) -> None: ...

    @abstractmethod
    def read(self) -> DataFrame: ...

    @abstractmethod
    def merge(self, batch_df: DataFrame, *, job: str, batch_id: int,
              counts: LineageCounts | None = None) -> MergeResult: ...

    @abstractmethod
    def truncate(self) -> None: ...


def bucket_of(n_buckets: int, keys: list[str] | None = None) -> Column:
    """Bucket id for a row — xxhash64 over (repo, path) so hot repos spread."""
    keys = keys or ["repo", "path"]
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def _lww_reduce(df: DataFrame, keys: list[str]) -> DataFrame:
    """One row per key: the greatest (_seq, op-rank) wins — the engine's
    single deterministic total order (SURVEY §8.3 #3).

    Physical shape (docs/PLANS.md, merge section): ``max_by`` with a STRUCT
    value buffer is declarative-with-immutable-buffer, so Spark compiles it
    to SortAggregate regardless of the ordering's type — the flat bigint
    ordering (_seq·4 + rank, rank ∈ 0..3) does NOT buy HashAggregateExec
    here. What the shape DOES deliver, and why it still beats the
    alternatives (operators/latest.py has the measurements):

    - ``partial_max_by`` map-side combine — the shuffle carries one row per
      (key, partition), not every event; that, not the agg algorithm, is
      the scale lever.
    - The per-partition sort under SortAggregate orders (keys, ordering)
      over whatever the caller feeds it — on the merge hot path that is
      ~50-byte metadata rows (late materialization), so the sort is narrow;
      measured 4× faster than the row_number-window formulation.
    - A ``max(ordering)``+join-back variant would re-scan the payload and
      — worse — emit BOTH copies of a key whose winning (_seq, _op) row is
      exactly duplicated (redelivery landing in two delta files), where
      max_by deterministically returns one. Correctness > the narrow sort.

    Safe: _seq < 2^61 at any conceivable log length."""
    ordering = F.col("_seq") * 4 + _rank(F.col("_op")) + 1
    payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(F.max_by(F.struct(*payload), ordering).alias("_row"))
    return agg.select(*keys, "_row.*").select(*df.columns)


def _rank(op_col: Column) -> Column:
    """Deterministic tiebreak when two events share a sequence number:
    U > I > D (SURVEY §8.3 #3 — ties must break identically on every replay
    and in the DuckDB oracle, which uses ORDER BY op DESC = same order).
    """
    return (
        F.when(op_col == "U", F.lit(2))
        .when(op_col == "I", F.lit(1))
        .when(op_col == "D", F.lit(0))
        .otherwise(F.lit(-1))
    )


# legal type-promotion chains (Iceberg's schema-evolution rules): integrals
# widen toward long, float widens to double. Everything else is an
# incompatible type change and must fail loudly — a silent cast here is
# data corruption at 10^10 rows.
_INTEGRAL_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_FRACTIONAL_RANK = {"float": 0, "double": 1}


def _widen_type(name: str, table_t: T.DataType, batch_t: T.DataType) -> T.DataType:
    """Resolve the evolved type for a column present in BOTH the table and
    the batch. Equal → unchanged. Batch narrower on a legal chain → keep the
    table type (the batch upcasts losslessly at alignment). Table narrower →
    promote the table type: metadata-only, because Spark 4's parquet reader
    (SPARK-40876 widening promotions) reads the old narrow files under the
    widened read schema — no rewrite, verified by test_type_widening. Any
    other pair (string↔numeric, integral↔fractional, narrowing across
    chains) raises."""
    if table_t == batch_t:
        return table_t
    for chain in (_INTEGRAL_RANK, _FRACTIONAL_RANK):
        a, b = chain.get(table_t.typeName()), chain.get(batch_t.typeName())
        if a is not None and b is not None:
            return table_t if a >= b else batch_t
    raise SinkCommitError(
        f"incompatible type change for column {name!r}: table has "
        f"{table_t.simpleString()}, batch has {batch_t.simpleString()} — only "
        f"widening promotions (byte/short/int->long, float->double) evolve"
    )


def plan_schema_changes(
    table_schema: T.StructType,
    batch_schema: T.StructType,
    *,
    keys: list[str] | tuple[str, ...] = (),
    bucket_keys: list[str] | tuple[str, ...] = (),
) -> list[dict]:
    """Dry-run of the merge's B9 schema-evolution rule: classify, column by
    column, what ``merge()`` would do with this batch — WITHOUT touching the
    table. The classification mirrors merge()'s own decisions exactly (same
    ``_widen_type`` chains, same key/bucket guard), so a clean report means
    the merge will not raise on schema grounds; a ``blocking`` row names the
    column and the reason before any data moves — the pre-flight a schema
    registry runs on every producer deploy.

    Kinds: ``unchanged`` · ``added`` (new column appends, existing rows read
    NULL) · ``widened`` (table type promotes metadata-only, SPARK-40876) ·
    ``batch_narrower`` (batch upcasts losslessly at alignment) ·
    ``batch_omits`` (batch rows null-fill the column) · ``missing_key`` /
    ``key_type_change`` / ``incompatible`` (blocking — merge would raise).
    """
    keyish = set(keys) | set(bucket_keys)
    tf = {f.name: f.dataType for f in table_schema.fields}
    bf = {f.name: f.dataType for f in batch_schema.fields}
    report: list[dict] = []

    def add(column, kind, action, blocking=False):
        report.append(
            {
                "column": column,
                "kind": kind,
                "table_type": tf[column].simpleString() if column in tf else None,
                "batch_type": bf[column].simpleString() if column in bf else None,
                "action": action,
                "blocking": blocking,
            }
        )

    for k in keys:
        if k not in bf:
            add(k, "missing_key", "merge raises: batch missing key column", True)
    for name, tt in tf.items():
        if name not in bf:
            if name not in keys:  # missing keys already reported as blocking
                add(name, "batch_omits", "batch rows null-fill this column")
            continue
        bt = bf[name]
        if tt == bt:
            add(name, "unchanged", "none")
            continue
        if name in keyish:
            add(
                name,
                "key_type_change",
                "merge raises: bucket routing hashes key values",
                True,
            )
            continue
        try:
            widened = _widen_type(name, tt, bt)
        except SinkCommitError:
            add(name, "incompatible", "merge raises: not a widening promotion", True)
            continue
        if widened == tt:
            add(name, "batch_narrower", "batch upcasts losslessly at alignment")
        else:
            add(
                name,
                "widened",
                f"table promotes to {widened.simpleString()} "
                f"(metadata-only; old files read widened)",
            )
    for name in bf:
        if name not in tf:
            if name in RESERVED_COLS:
                add(name, "reserved_name",
                    "merge raises: name reserved for engine internals", True)
            else:
                add(name, "added", "column appends; existing rows read NULL")
    return report


def _merge_zone(old: list | None, lo: int, hi: int) -> list[int]:
    """Widen a bucket's [min_seq, max_seq] zone with a new commit's range.
    Zones are CONSERVATIVE (may be wider than the rows actually present
    after a COW rewrite drops superseded versions) — sound for pruning,
    tightened to exact bounds whenever compact()/rebucket() rescans."""
    if old is None:
        return [int(lo), int(hi)]
    return [min(int(old[0]), int(lo)), max(int(old[1]), int(hi))]


def diff_states(
    a: DataFrame, b: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """The NET row-level I/U/D delta that turns state ``a`` into state ``b``:
    ``change_op`` 'I' for keys only in ``b``, 'D' for keys only in ``a``, 'U'
    for keys whose compared payload differs. 'D' rows carry the ``a`` payload,
    'I'/'U' rows the ``b`` payload (projected to ``compare_cols``).

    Shared by ``changes_between`` (two versions of ONE table) and the
    replicator's repair path (source state vs replica state). Scale shape:
    ONE full-outer join of the two states projected to (keys + compare_cols)
    — O(|a| + |b|) shuffle; keep ``compare_cols`` narrow (a fingerprint
    column) and join payloads back by key downstream.
    """
    an = a.select(*keys, *[F.col(c).alias(f"_a_{c}") for c in compare_cols])
    bn = b.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in compare_cols])
    # join on key equality; keys are non-null by the merge contract
    j = an.withColumn("_in_a", F.lit(True)).join(
        bn.withColumn("_in_b", F.lit(True)), keys, "full_outer"
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    op = (
        F.when(F.col("_in_a").isNull(), F.lit("I"))
        .when(F.col("_in_b").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out = j.withColumn("change_op", op).where(F.col("change_op").isNotNull())
    return out.select(
        *keys,
        "change_op",
        *[
            F.when(F.col("change_op") == "D", F.col(f"_a_{c}"))
            .otherwise(F.col(f"_b_{c}"))
            .alias(c)
            for c in compare_cols
        ],
    )


def load_manifest_keys(*tables) -> None:
    """Force each EXISTING table handle to restore its authoritative
    keys/bucket_keys from its on-disk manifest (no-op for not-yet-created
    tables or sinks without a manifest). Call before deriving another
    table's layout — or validating arguments — from a handle's ``.keys``:
    a handle opened without explicit keys carries the engine defaults until
    its first manifest load, and acting on those silently mis-keys the
    derived table (r3 code review: JoinView/Scd2/codesearch/rollup all
    snapshot source keys at init)."""
    for t in tables:
        require = getattr(t, "_require_manifest", None)
        if require is not None and t.exists():
            require()


class ParquetSnapshotTable(LakeTable):
    LINEAGE_SCHEMA = T.StructType(
        [
            T.StructField("job", T.StringType()),
            T.StructField("batch_id", T.LongType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("last_seq", T.LongType()),
            T.StructField("rows_upserted", T.LongType()),
            T.StructField("rows_deleted", T.LongType()),
            T.StructField("rows_quarantined", T.LongType()),
            T.StructField("rows_late", T.LongType()),
            T.StructField("input_hash", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("wall_ms", T.LongType()),
            T.StructField("committed_ts", T.TimestampType()),
        ]
    )

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        keys: list[str] | None = None,
        n_buckets: int = 32,
        merge_strategy: str = "auto",
        broadcast_threshold_rows: int = 2_000_000,
        write_partitions: int | None = None,
        strict_duplicate_check: bool = False,
        write_mode: str = "auto",
        max_deltas: int = 8,
        mor_batch_fraction: float = 0.1,
        bucket_keys: list[str] | None = None,
        retain_history: int | None = None,
        cluster_within_buckets: list[str] | None = None,
        optimistic_rebase: bool = True,
        bloom_filter_keys: bool = False,
        zorder_on_write: bool = False,
    ) -> None:
        """``write_mode`` — the write-amplification control (LSM-style):

        - 'cow': copy-on-write — every merge rewrites the affected buckets
          fully. Best read performance (one sorted-resolution-free file set
          per bucket); catastrophic for steady-state CDC where a small batch
          touches most buckets (write amplification ≈ table/batch per batch).
        - 'mor': merge-on-read — the batch's winners append as a bucketed
          DELTA dir; last-writer-wins resolution happens at read time (the
          same LWW the merge already defines). Write cost = O(batch).
          Buckets whose delta chain exceeds ``max_deltas`` are compacted
          inline within the same atomic commit, bounding read amplification.
          Compaction is STAGGERED: each bucket also has a round-robin
          cohort slot (``version % max_deltas == bucket % max_deltas``)
          that compacts it once its chain exceeds 2, so broad-touch CDC
          batches compact ~1/max_deltas of the buckets per commit instead
          of every bucket in the same commit (a periodic full-table-rewrite
          stall). The hard chain bound ``max_deltas + 1`` is unchanged.
        - 'auto': 'mor' when the batch is below ``mor_batch_fraction`` of
          the affected current rows (steady-state CDC), else 'cow'
          (bulk loads / backfills).
        """
        self.spark = spark
        self.root = root
        self.keys = keys or list(DEFAULT_KEYS)
        # bucket layout key: a strict prefix of the primary key so related
        # versions co-locate. Default (repo, path) — NOT repo alone, so the
        # hot mega-repo spreads (B10/B11); for custom primary keys the bucket
        # key is the full key unless the caller narrows it.
        if bucket_keys is not None:
            self.bucket_keys = list(bucket_keys)
        elif self.keys == list(DEFAULT_KEYS):
            self.bucket_keys = ["repo", "path"]
        else:
            self.bucket_keys = list(self.keys)
        missing_bk = [k for k in self.bucket_keys if k not in self.keys]
        if missing_bk:
            raise SinkCommitError(
                f"bucket_keys {missing_bk} not part of table keys {self.keys}"
            )
        self.n_buckets = n_buckets
        if merge_strategy not in ("auto", "broadcast", "anti", "copart", "shuffle"):
            raise SinkCommitError(f"unknown merge_strategy {merge_strategy!r}")
        self.merge_strategy = merge_strategy
        self.broadcast_threshold_rows = broadcast_threshold_rows
        self.write_partitions = write_partitions
        self.strict_duplicate_check = strict_duplicate_check
        if write_mode not in ("auto", "cow", "mor"):
            raise SinkCommitError(f"unknown write_mode {write_mode!r}")
        self.write_mode = write_mode
        self.max_deltas = max_deltas
        self.mor_batch_fraction = mor_batch_fraction
        # Time travel (Iceberg-snapshot analog): every commit also writes an
        # immutable history/manifest.v{N}.json; ``retain_history`` is the
        # snapshot-expiration policy — data files referenced by the last K
        # versions survive GC, so ``read(version=...)`` works for those.
        # 0 = today's behavior (history manifests are still written — they
        # are a metadata audit log — but their data files are not retained).
        # Retention is a TABLE PROPERTY, not a handle flag (Iceberg stores
        # it the same way): an explicit value here is persisted into the
        # manifest at the handle's next commit, and a handle opened WITHOUT
        # one (None) resolves the persisted value — so a maintenance verb
        # (rebucket/compact/optimize) run from a fresh process can never
        # silently GC the retention window the writer configured.
        if retain_history is not None and retain_history < 0:
            raise SinkCommitError(f"retain_history must be >= 0, got {retain_history}")
        self._retain_history = retain_history
        self.optimistic_rebase = optimistic_rebase
        # opt-in parquet bloom filters on the key columns: row-group-level
        # point-lookup skipping INSIDE the bucket the manifest already
        # routed to (bucket pruning bounds the scan to one dir; the bloom
        # lets the parquet reader skip row groups that provably lack the
        # key — the 10^10-row lookup path). Costs ~1.2 bytes/key per file;
        # off by default because append-heavy tables that are never point-
        # queried would pay it for nothing.
        self.bloom_filter_keys = bloom_filter_keys
        # Data-skipping layout knob (the Z-ORDER-lite / CLUSTER BY analog):
        # sort rows by these columns WITHIN each write task before the
        # parquet write (sortWithinPartitions — no extra shuffle). Clustered
        # columns get tight per-row-group min/max stats, so selective scans
        # on them skip row groups at read time (parquet filter pushdown is
        # already on); unclustered layouts interleave values and stats prune
        # nothing. Lexicographic multi-column clustering: best for the
        # leading column, like a secondary index prefix. Deliberately a
        # WRITER-HANDLE knob (each merge's batch is sorted as it lands),
        # unlike the zorder_by TABLE property compact() persists: the
        # Morton layout is a maintenance-time policy the scheduler must
        # keep, while per-merge clustering is the ingest job's own choice.
        self.cluster_within_buckets = (
            list(cluster_within_buckets) if cluster_within_buckets else None
        )
        # Opt-in write-time curve maintenance (the liquid-clustering idea,
        # vs Delta's OPTIMIZE-only z-order): when the table carries a
        # persisted zorder_by layout, sort each merge's bucket writes by
        # the SAME Morton key built from the persisted zorder_stats bounds
        # — literals from the manifest, so the hot path gains only the
        # in-task sort, never a stats scan. New deltas stay curve-
        # clustered between scheduled compactions; values outside the
        # fitted bounds clamp (layout heuristic — the next z-ordered
        # rewrite re-fits). Off by default: ingest jobs that are never
        # selectively scanned shouldn't pay a write-side sort. Takes
        # precedence over cluster_within_buckets when both are set.
        self.zorder_on_write = bool(zorder_on_write)

    @property
    def retain_history(self) -> int:
        """Effective retention: the handle's explicit value, else the
        persisted table property (a driver-side JSON read), else 0."""
        if self._retain_history is not None:
            return self._retain_history
        man = self._read_manifest()
        if man:
            try:
                return int(man.get("properties", {}).get("retain_history", 0))
            except (TypeError, ValueError):
                return 0
        return 0

    @staticmethod
    def _dirs_of(man: dict, b) -> list[str]:
        """Manifest bucket value → list of dirs (str legacy / list current)."""
        v = man["buckets"].get(str(b))
        if v is None:
            return []
        return [v] if isinstance(v, str) else list(v)

    # ---- manifest ---------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _read_manifest(self) -> dict | None:
        if not os.path.exists(self._manifest_path):
            return None
        with open(self._manifest_path, "r", encoding="utf-8") as fh:
            man = json.load(fh)
        # the on-disk layout is authoritative: restore keys on EVERY head
        # manifest load, not just _require_manifest — followers reach
        # handles via published_version()/last_committed_batch first, and a
        # handle opened without explicit keys must never act on the engine
        # defaults once the real table has been seen (JoinView/Scd2 snapshot
        # source keys at init).
        if man.get("keys"):
            self.keys = list(man["keys"])
        if man.get("bucket_keys"):
            self.bucket_keys = list(man["bucket_keys"])
        return man

    _LOCK_TIMEOUT_S = 10.0   # how long a committer waits for the lock
    _LOCK_STALE_S = 60.0     # a lock older than this is a crashed writer's
    _INFLIGHT_STALE_S = 3600.0  # an in-flight write marker older than this
    #                             is a crashed writer's (vacuum-grace scale:
    #                             markers outlive any sane write duration)

    def _begin_attempt(self) -> str:
        """Register an in-flight commit attempt: a token that uniquifies the
        attempt's data/lineage dir names AND a ``data/.inflight.<token>``
        marker protecting those dirs from a CONCURRENT writer's in-commit
        orphan GC (without it, writer A committing version N+1 could sweep
        writer B's still-being-written attempt dirs — B's version embeds the
        shared base+1, which is already < A's head). The marker is removed
        on any non-crash exit (``_end_attempt`` in the merge's finally); a
        hard crash leaves it, and GC honors it only until
        ``_INFLIGHT_STALE_S`` — after that the dir is an ordinary orphan."""
        token = uuid.uuid4().hex[:12]
        d = os.path.join(self.root, "data")
        os.makedirs(d, exist_ok=True)
        marker = os.path.join(d, f".inflight.{token}")
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write(f"{os.getpid()}\n")
        self._attempt_marker = marker
        return token

    def _end_attempt(self) -> None:
        marker = getattr(self, "_attempt_marker", None)
        if marker:
            try:
                os.remove(marker)
            except OSError:
                pass
            self._attempt_marker = None

    def _inflight_tokens(self) -> set[str]:
        """Tokens of live (non-stale) in-flight attempt markers; stale
        markers are swept as a side effect."""
        d = os.path.join(self.root, "data")
        out: set[str] = set()
        if not os.path.isdir(d):
            return out
        now = time.time()
        for name in os.listdir(d):
            if not name.startswith(".inflight."):
                continue
            path = os.path.join(d, name)
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                continue
            if age <= self._INFLIGHT_STALE_S:
                out.add(name[len(".inflight."):])
            else:
                try:
                    os.remove(path)
                except OSError:
                    pass
        return out

    @staticmethod
    def _attempt_token_of(dirname: str) -> str | None:
        """The attempt token embedded in a dir name (``v{N}_w{token}`` /
        ``l{N}_w{token}``), or None for legacy/rewrite names."""
        m = re.search(r"_w([0-9a-f]{12})", dirname)
        return m.group(1) if m else None

    def _acquire_commit_lock(self) -> str:
        """Exclusive short-lived commit lock (O_CREAT|O_EXCL — atomic on
        POSIX and on every shared filesystem that backs a lake). Held only
        around read-check-replace, i.e. milliseconds; a crashed writer's
        stale lock is broken after ``_LOCK_STALE_S`` by mtime."""
        lock = os.path.join(self.root, ".manifest.lock")
        deadline = time.monotonic() + self._LOCK_TIMEOUT_S
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"{os.getpid()}\n".encode())
                os.close(fd)
                return lock
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                    if age > self._LOCK_STALE_S:
                        # Break the crashed writer's lock ATOMICALLY: rename
                        # to a unique name first — of N concurrent breakers
                        # exactly one rename succeeds, so a stat-then-remove
                        # pair can never delete a DIFFERENT (fresh) lock that
                        # appeared in between (the r3 TOCTOU finding: two
                        # breakers both removing → both acquiring). Then
                        # re-verify age on the renamed file: if we raced a
                        # release+fresh-acquire and stole a LIVE lock, hand
                        # it back via link (which refuses to clobber a newer
                        # lock). A writer paused >60s inside its ms-long
                        # critical section can still lose its lease — the
                        # inherent lease-lock limit — and the version CAS in
                        # _swap_manifest remains the corruption backstop.
                        stale = lock + f".break.{uuid.uuid4().hex}"
                        try:
                            os.rename(lock, stale)
                        except OSError:
                            continue  # another breaker won, or it released
                        try:
                            still = time.time() - os.path.getmtime(stale)
                        except OSError:
                            still = self._LOCK_STALE_S + 1
                        if still <= self._LOCK_STALE_S:
                            try:
                                os.link(stale, lock)  # stole a live lock: give back
                            except OSError:
                                pass
                        os.remove(stale)
                        continue
                except OSError:
                    continue  # lock vanished between open and stat — retry
                if time.monotonic() > deadline:
                    raise SinkCommitError(
                        f"commit lock at {lock} held by another writer for "
                        f">{self._LOCK_TIMEOUT_S}s — concurrent committer or "
                        f"stale lock younger than {self._LOCK_STALE_S}s"
                    )
                time.sleep(0.05)

    def _swap_manifest(
        self,
        manifest: dict,
        rebase: Optional[Callable[[dict], dict | None]] = None,
    ) -> dict:
        """The commit point: compare-and-swap under a short exclusive lock,
        then write-then-rename (atomic on POSIX). The CAS closes the
        concurrent-writer race: every committer derives ``version = base+1``
        from the manifest it read, so if the on-disk version no longer
        equals ``base`` another writer committed in between — losing that
        writer's bucket updates by last-write-wins would silently corrupt
        the table. ``rebase`` (Iceberg's optimistic-concurrency retry,
        decided HERE, under the lock, race-free): given the CURRENT head it
        may return a rebased manifest at ``head+1`` re-applying this
        commit's deltas on top — see ``_rebase_commit`` for when that is
        provably safe — or None, in which case the late committer gets a
        clean ``SinkCommitError`` (retry = re-read + re-merge). The
        committed bytes are also snapshotted to an immutable
        ``history/manifest.v{N}.json`` (the Iceberg metadata-file analog)
        so past versions stay addressable for time travel / audit — written
        BEFORE the swap, and a write failure fails the commit: under
        write-audit-publish the published version is resolved *through*
        this snapshot, so losing it silently would brick every read() for
        the audit window. A crash between snapshot and swap leaves only an
        orphan history file for a version that never committed — inert
        (``_manifest_at`` rejects versions beyond the head) and overwritten
        by the retried commit. Returns the manifest that actually committed
        (== input, or the rebased one)."""

        def _finalize(man: dict) -> str:
            if self._retain_history is not None:
                # persist the explicitly-configured retention as a table
                # property so later handles (maintenance verbs, other
                # processes) opened without the flag honor the same window
                man.setdefault("properties", {})["retain_history"] = (
                    self._retain_history
                )
            man["committed_at_ms"] = int(time.time() * 1000)
            return json.dumps(man, indent=1, sort_keys=True)

        payload = _finalize(manifest)
        tmp = os.path.join(self.root, f"manifest.tmp.{uuid.uuid4().hex}")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(payload)
            fh.flush()
            os.fsync(fh.fileno())
        expected_prior = manifest["version"] - 1
        lock = self._acquire_commit_lock()
        try:
            current = self._read_manifest()
            cur_v = None if current is None else current["version"]
            if expected_prior < 0:
                if current is not None:
                    os.remove(tmp)
                    raise SinkCommitError(
                        f"create race: table at {self.root} already exists "
                        f"(version {cur_v})"
                    )
            elif cur_v != expected_prior:
                rebased = (
                    rebase(current)
                    if rebase is not None and current is not None
                    else None
                )
                if rebased is None:
                    os.remove(tmp)
                    raise SinkCommitError(
                        f"concurrent writer: table at {self.root} is at version "
                        f"{cur_v}, expected {expected_prior} — another commit "
                        f"landed since this batch read the manifest and the "
                        f"changes cannot be rebased safely (overlapping "
                        f"buckets, schema/property divergence, or a staged "
                        f"chain); re-read and re-apply (this guard turns a "
                        f"silent lost-update into a clean failure)"
                    )
                assert rebased["version"] == cur_v + 1
                manifest = rebased
                payload = _finalize(manifest)
                with open(tmp, "w", encoding="utf-8") as fh:
                    fh.write(payload)
                    fh.flush()
                    os.fsync(fh.fileno())
            try:
                hdir = os.path.join(self.root, "history")
                os.makedirs(hdir, exist_ok=True)
                htmp = os.path.join(hdir, f".tmp.{uuid.uuid4().hex}")
                with open(htmp, "w", encoding="utf-8") as fh:
                    fh.write(payload)
                os.replace(
                    htmp,
                    os.path.join(hdir, f"manifest.v{manifest['version']}.json"),
                )
            except OSError as exc:
                os.remove(tmp)
                raise SinkCommitError(
                    f"could not write history snapshot for version "
                    f"{manifest['version']}: {exc} — failing the commit "
                    f"(time travel / WAP publish resolve through it)"
                ) from exc
            os.replace(tmp, self._manifest_path)
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass
        return manifest

    def _rebase_commit(
        self,
        base: dict,
        man_new: dict,
        current: dict,
        touched: list[int],
        job: str,
        batch_id: int,
        staged: bool = False,
    ) -> dict | None:
        """Iceberg-style optimistic concurrency: decide, under the commit
        lock, whether THIS commit (derived from ``base``, intended as
        ``man_new``) can re-apply on top of ``current`` (another writer's
        head). Safe exactly when the two commits are INDEPENDENT:

        - every bucket this commit rewrote is bit-identical between base
          and current (the other writer touched a disjoint bucket set), so
          our rewrite — computed against base's bucket contents — is equally
          valid against current's;
        - schema, table properties (constraints!), key/bucket layout are
          unchanged (a concurrent evolution would invalidate our aligned
          write or un-checked constraints);
        - the other writer is a DIFFERENT job and the guard map only grew
          (a same-job concurrent commit is an ordering hazard; a shrunk or
          rewound guard means truncate/rollback landed — semantic conflict);
        - no write-audit-publish chain is open on either side and this
          commit is not itself staged (publish resolution must stay linear).

        On success returns the rebased manifest at ``current.version + 1``:
        current's state plus our touched buckets, guard entry, job state and
        lineage. Data files need no rework — attempt dirs are uniquely named
        (``v{N}_w{token}``) so both writers' files coexist, and the rebased
        manifest simply references ours. Anything else returns None (clean
        conflict error upstream). Reference: Iceberg's commit path
        (SnapshotProducer retry with conflict detection by partition/file
        overlap), re-expressed over bucket entries.

        Deployment note: a concurrent writer reads its BASE snapshot's data
        dirs while other commits advance the head, so multi-writer tables
        must run with ``retain_history`` covering the longest in-flight
        merge (≥1 version per concurrent writer) — otherwise the stale
        reader's scan can hit GC'd dirs mid-merge (exactly Iceberg's
        expire-snapshots-vs-long-running-reader contract)."""
        if not self.optimistic_rebase or staged:
            return None
        if base.get("published_version") not in (None, base["version"]):
            return None
        if current.get("published_version") not in (None, current["version"]):
            return None
        if current["version"] <= base["version"]:
            return None  # head moved backwards: manual surgery — bail
        if current.get("n_buckets") != base.get("n_buckets"):
            return None
        if current.get("bucket_keys") != base.get("bucket_keys"):
            return None
        if current.get("keys") != base.get("keys"):
            return None
        if current["schema"] != base["schema"]:
            return None
        if current.get("properties", {}) != base.get("properties", {}):
            return None
        if current["committed"].get(job) != base["committed"].get(job):
            return None
        # guard map must have only GROWN — every job base knew is still
        # present at the same-or-later batch id (truncate empties it,
        # rollback rewinds it: both are semantic conflicts, never rebased)
        for j, b in base["committed"].items():
            cur_b = current["committed"].get(j)
            if cur_b is None or int(cur_b) < int(b):
                return None
        czones = current.get("bucket_zones", {})
        bzones = base.get("bucket_zones", {})
        crows = current.get("bucket_rows", {})
        brows_ = base.get("bucket_rows", {})
        for b in touched:
            bs = str(b)
            if current["buckets"].get(bs) != base["buckets"].get(bs):
                return None
            if czones.get(bs) != bzones.get(bs) or crows.get(bs) != brows_.get(bs):
                return None
        reb = dict(current)
        reb["version"] = current["version"] + 1
        reb["schema"] = man_new["schema"] if "schema" in man_new else current["schema"]
        for field in ("buckets", "bucket_rows", "bucket_zones"):
            merged = dict(current.get(field, {}))
            ours = man_new.get(field, {})
            for b in touched:
                bs = str(b)
                if bs in ours:
                    merged[bs] = ours[bs]
            reb[field] = merged
        reb["committed"] = {**current["committed"], job: batch_id}
        if job in man_new.get("state", {}):
            reb["state"] = {**current.get("state", {}), job: man_new["state"][job]}
        # our commit may ADD properties (merge(properties=...)); base and
        # current properties are equal (checked), so overlaying ours is safe
        if man_new.get("properties", {}) != base.get("properties", {}):
            reb["properties"] = {
                **current.get("properties", {}),
                **man_new.get("properties", {}),
            }
        base_lineage = set(base.get("lineage", []))
        reb["lineage"] = list(current.get("lineage", [])) + [
            rel for rel in man_new.get("lineage", []) if rel not in base_lineage
        ]
        self._stamp_published(reb, current, staged=False)
        return reb

    def _manifest_at(self, version: int | None) -> dict:
        """The committed manifest for ``version`` (None = current). Historical
        versions load from the immutable history snapshot; a version whose
        data files have been GC'd (older than ``retain_history``) raises a
        clear expiration error instead of a partial read."""
        man = self._require_manifest()
        if version is None:
            # readers resolve the PUBLISHED version; while a WAP staged
            # chain is open that is behind the head (see publish())
            pub = man.get("published_version")
            if pub is not None and int(pub) != man["version"]:
                return self._manifest_at(int(pub))
            return man
        if version == man["version"]:
            return man
        if version > man["version"]:
            # never serve a history file beyond the head: a crash between
            # the pre-swap history write and the manifest swap can leave an
            # orphan snapshot for a version that never committed
            raise SinkCommitError(
                f"version {version} does not exist at {self.root} "
                f"(head is {man['version']})"
            )
        hpath = os.path.join(self.root, "history", f"manifest.v{version}.json")
        if not os.path.exists(hpath):
            raise SinkCommitError(
                f"version {version} has no history snapshot at {self.root} "
                f"(current: {man['version']})"
            )
        with open(hpath, "r", encoding="utf-8") as fh:
            old = json.load(fh)
        missing = [
            rel
            for b in old["buckets"]
            for rel in self._dirs_of(old, b)
            if not os.path.isdir(os.path.join(self.root, rel))
        ]
        if missing:
            raise SinkCommitError(
                f"version {version} expired: {len(missing)} data dir(s) "
                f"GC'd (retain_history={self.retain_history}); "
                f"oldest readable is version {man['version'] - self.retain_history}"
            )
        return old

    def version_at_timestamp(self, ts_ms: int) -> int:
        """The version that was current at wall-clock ``ts_ms`` (Iceberg
        ``TIMESTAMP AS OF`` resolution): the newest committed version whose
        commit time is <= the timestamp. Driver-side walk of the history
        manifests — no Spark job. Manifests from before commit-time stamping
        count as arbitrarily old. Raises if the table didn't exist yet."""
        man = self._require_manifest()
        best: int | None = None
        best_ts = -1
        hdir = os.path.join(self.root, "history")
        candidates: list[dict] = [man]
        if os.path.isdir(hdir):
            for name in os.listdir(hdir):
                if not name.startswith("manifest.v"):
                    continue
                try:
                    with open(os.path.join(hdir, name), "r", encoding="utf-8") as fh:
                        candidates.append(json.load(fh))
                except (OSError, ValueError):
                    continue
        for m in candidates:
            if int(m["version"]) > man["version"]:
                # orphan pre-swap snapshot of a crashed commit — not a
                # committed version (same guard as _manifest_at)
                continue
            cts = int(m.get("committed_at_ms", -1))
            if cts <= int(ts_ms) and (cts, m["version"]) > (best_ts, best or -1):
                best, best_ts = int(m["version"]), cts
        if best is None:
            raise SinkCommitError(
                f"no version of {self.root} existed at timestamp {ts_ms}"
            )
        return best

    def read_as_of(self, ts_ms: int) -> DataFrame:
        """Time travel by wall-clock instead of version number — the
        ``SELECT * FROM t TIMESTAMP AS OF ...`` analog."""
        return self.read(version=self.version_at_timestamp(ts_ms))

    def expire_snapshots(self, keep: int | None = None,
                         older_than_ms: int | None = None) -> int:
        """Iceberg ``expire_snapshots`` analog: drop history manifests older
        than the last ``keep`` versions (default: ``retain_history``) and GC
        the data files only they referenced. ``older_than_ms`` additionally
        requires an expired snapshot's commit time to be below the cutoff
        (the Iceberg ``older_than`` knob) — younger snapshots survive even
        outside the version window. Returns the number of snapshots
        expired. The current manifest is never touched."""
        man = self._require_manifest()
        keep = self.retain_history if keep is None else keep
        if keep < 0:
            raise SinkCommitError(f"keep must be >= 0, got {keep}")
        # keep < retain_history is an EXPLICIT shrink of the readable window
        # (this is the destructive maintenance verb): the expired versions'
        # manifests go first, so _live_dirs below no longer sees them and
        # their uniquely-referenced data dirs are swept in the same pass.
        # Reads into the shrunk window then raise the clean "no history
        # snapshot" error (pinned by test_expire_snapshots); tagged and
        # published versions are never expired regardless of the window.
        hdir = os.path.join(self.root, "history")
        removed = 0
        age_kept_oldest = man["version"]
        tagged = {int(v) for v in man.get("refs", {}).values()}
        if man.get("published_version") is not None:
            tagged.add(int(man["published_version"]))
        if os.path.isdir(hdir):
            for name in os.listdir(hdir):
                if not name.startswith("manifest.v"):
                    continue
                v = self._version_of(name[len("manifest."):-len(".json")])
                if v >= man["version"] - keep or v in tagged:
                    continue
                if older_than_ms is not None:
                    try:
                        with open(os.path.join(hdir, name), "r", encoding="utf-8") as fh:
                            cts = int(json.load(fh).get("committed_at_ms", -1))
                    except (OSError, ValueError):
                        cts = -1
                    if cts >= int(older_than_ms):
                        # too young to expire: its manifest survives OUTSIDE
                        # the version window, so widen the data-dir retention
                        # to cover it (the expire-vs-GC consistency rule:
                        # every surviving manifest must stay readable)
                        age_kept_oldest = min(age_kept_oldest, v)
                        continue
                try:
                    os.remove(os.path.join(hdir, name))
                    removed += 1
                except OSError:
                    pass
        # _gc_orphans only retains dirs whose history manifest still exists,
        # so the expired versions' files fall out here. Retain by the
        # EFFECTIVE window: keep > retain_history must not GC data dirs of
        # versions the caller asked to keep (their manifests survive above).
        self._gc_orphans(
            man,
            retain=max(keep, self.retain_history, man["version"] - age_kept_oldest),
        )
        return removed

    def plan_maintenance(
        self,
        *,
        target_rows_per_bucket: int = 4_000_000,
        compact_chain_threshold: int | None = None,
        expire_slack: int = 64,
    ) -> dict:
        """Decide which table services are due — from the manifest alone (a
        driver-side JSON read: no Spark job, no data scan), so a scheduler
        can poll it every few minutes for free:

        - **compact** when any bucket's delta chain reaches
          ``compact_chain_threshold`` (default ``max(2, max_deltas // 2)``)
          — halfway to the inline-compaction ceiling, so scheduled service
          normally beats the in-commit fold and keeps merge latency flat.
        - **rebucket** (with hysteresis) when estimated rows per bucket
          exceed 2× ``target_rows_per_bucket``; the proposed count doubles
          until the estimate fits the target — the knob that keeps
          per-bucket volume ~constant as the table grows 1000×.
        - **expire** when more than ``expire_slack`` history manifests older
          than ``retain_history`` are still on disk. The slack keeps recent
          manifests around as a metadata audit log (they are tiny JSON; the
          data-dir GC never waits for this) and makes optimize a true no-op
          on young tables.

        ``bucket_rows`` are exact physical counts (parquet-footer-exact
        after COW/compact/rebucket; exact delta increments under MOR, so a
        chain's count includes superseded row versions — which is what
        read/compact cost), the right fidelity for a scheduling decision.
        """
        man = self._require_manifest()
        threshold = compact_chain_threshold or max(2, self.max_deltas // 2)
        max_chain = max(
            (len(self._dirs_of(man, b)) - 1 for b in man["buckets"]), default=0
        )
        total_rows = sum(int(r) for r in man.get("bucket_rows", {}).values())
        n_buckets = int(man["n_buckets"])
        new_n = n_buckets
        if total_rows > 2 * target_rows_per_bucket * n_buckets:
            while total_rows > target_rows_per_bucket * new_n:
                new_n *= 2
        hdir = os.path.join(self.root, "history")
        expirable = 0
        tagged = {int(v) for v in man.get("refs", {}).values()}
        if man.get("published_version") is not None:
            tagged.add(int(man["published_version"]))
        # hoisted: the property getter re-reads manifest.json when the handle
        # carries no explicit value — once per poll, not once per history file
        retain = self.retain_history
        if os.path.isdir(hdir):
            for name in os.listdir(hdir):
                if name.startswith("manifest.v"):
                    v = self._version_of(name[len("manifest."):-len(".json")])
                    if v < man["version"] - retain and v not in tagged:
                        expirable += 1
        return {
            "compact": max_chain >= threshold,
            "max_delta_chain": max_chain,
            "rebucket_to": new_n if new_n != n_buckets else None,
            "rows_estimate": total_rows,
            "rows_per_bucket": total_rows // max(1, n_buckets),
            "expire": expirable > expire_slack,
            "expirable_snapshots": expirable,
        }

    def optimize(self, **plan_kwargs) -> dict:
        """Run whatever ``plan_maintenance`` says is due, cheapest-correct
        order: a due rebucket subsumes compaction (the rewrite folds every
        delta chain), expiration runs last against the newest version.
        Returns ``{"plan": ..., "actions": {...}}`` — empty actions means a
        healthy table (safe to cron alongside the ingest job; each service
        is itself an atomic commit under the CAS guard)."""
        plan = self.plan_maintenance(**plan_kwargs)
        actions: dict = {}
        if plan["rebucket_to"]:
            actions["rebucket"] = self.rebucket(plan["rebucket_to"])
        elif plan["compact"]:
            actions["compact"] = self.compact()
        if plan["expire"]:
            actions["expired_snapshots"] = self.expire_snapshots()
        return {"plan": plan, "actions": actions}

    # ---- tags (Iceberg named-ref analog; tags only — branches imply
    # multi-head writes, out of scope for the single-writer deployment) ----

    # ---- write-audit-publish (Iceberg WAP analog) --------------------------
    #
    # The audit-then-publish CDC flow: merges committed with ``staged=True``
    # advance the version chain but NOT the table readers see. ``read()``
    # (and lookup/modified_since/changes_between defaults) resolve the
    # PUBLISHED version; auditors read the staged head via ``read_staged()``
    # / ``read(version=current_version())``, run their checks, then
    # ``publish()`` (one metadata-only commit) makes the whole staged chain
    # visible atomically, or ``abort_staged()`` restores the published state
    # (rollback semantics: the staged batches lose their guard entries and a
    # replay re-applies them). This is Iceberg's WAP workflow (stage via
    # spark.wap.id, publish via cherry-pick/fast-forward) expressed in the
    # snapshot table's linear history — no ref forking, so every existing
    # invariant (CAS commit, exactly-once guard, GC, time travel) holds
    # unchanged. While a chain is open, EVERY commit stays staged (a
    # maintenance compact can't accidentally publish half an audit); only
    # publish()/abort_staged() close it. The published version's data dirs
    # are GC-exempt like tagged versions, so a long audit can't expire the
    # readers' table out from under them.

    def _stamp_published(self, man_new: dict, base: dict, staged: bool = False) -> None:
        """Maintain ``published_version`` across a commit. Tables that never
        stage never get the field (zero behavior change); once present:
        staged commits and commits inside an open chain pin it, ordinary
        commits on a closed chain track their own version."""
        base_pub = base.get("published_version")
        if staged:
            man_new["published_version"] = (
                base["version"] if base_pub is None else base_pub
            )
        elif base_pub is not None and base_pub < base["version"]:
            man_new["published_version"] = base_pub  # chain open: stay pinned
        elif "published_version" in man_new:
            man_new["published_version"] = man_new["version"]

    def published_version(self) -> int | None:
        """The version readers resolve (== current_version() unless a staged
        chain is open)."""
        man = self._read_manifest()
        if man is None:
            return None
        pv = man.get("published_version")
        return int(man["version"] if pv is None else pv)

    def staged_versions(self) -> list[int]:
        """Versions committed but not yet published (empty = chain closed)."""
        man = self._require_manifest()
        pub = man.get("published_version", man["version"])
        return list(range(int(pub) + 1, int(man["version"]) + 1))

    def read_staged(self) -> DataFrame:
        """The staged head — the audit surface; equals read() when no chain
        is open."""
        man = self._require_manifest()
        return self._resolved(man).where(F.col("_op") != "D").drop(*INTERNAL_COLS)

    def publish(self, to_version: int | None = None) -> int:
        """Fast-forward the published pointer to the staged head — ONE
        metadata-only commit making every staged batch visible atomically.
        No-op (returns current version) when nothing is staged.

        ``to_version`` publishes only the chain prefix up to that version
        (later staged commits stay staged — the chain remains open). This is
        the idempotent replay primitive the multi-table coordinator
        (plans/txn_commit.py) needs: re-publishing an already-published
        version is a clean no-op, and commits staged AFTER a coordinator's
        intent was recorded are never dragged into its transaction."""
        man = self._require_manifest()
        head = int(man["version"])
        pub = int(man.get("published_version", head))
        target = head if to_version is None else int(to_version)
        if target > head:
            raise SinkCommitError(
                f"cannot publish to version {target}: head is {head}"
            )
        if target <= pub:
            return head
        man_new = dict(man)
        man_new["version"] = head + 1
        # a full publish makes the publish commit itself the published head;
        # a prefix publish pins the pointer and leaves the chain open
        man_new["published_version"] = head + 1 if target == head else target
        self._swap_manifest(man_new)
        return int(man_new["version"])

    def abort_staged(self) -> int:
        """Discard the open staged chain: restore the published state as a
        new PUBLISHED commit (rollback semantics — the staged batches' guard
        entries vanish, so a replay re-ingests them after the audit failure
        is fixed). No-op when nothing is staged."""
        man = self._require_manifest()
        pub = man.get("published_version", man["version"])
        if pub == man["version"]:
            return int(man["version"])
        old = self._manifest_at(int(pub))
        man_new = dict(old)
        man_new["version"] = man["version"] + 1
        man_new["published_version"] = man_new["version"]
        man_new["refs"] = dict(man.get("refs", {}))
        # table properties (retention policy etc.) are table-level metadata,
        # not snapshot content — restoring old data must not revert them
        man_new["properties"] = dict(man.get("properties", {}))
        self._swap_manifest(man_new)
        self.n_buckets = int(man_new["n_buckets"])
        return int(man_new["version"])

    def create_tag(self, name: str, version: int | None = None) -> int:
        """Pin ``version`` (default: current) under a stable name. A tagged
        version is EXEMPT from snapshot expiration and data-dir GC until the
        tag is dropped — the retention story for audits/reproducibility
        ("the exact table the model trained on") that a rolling
        ``retain_history`` window can't give. Metadata-only commit; returns
        the tagged version."""
        man = self._require_manifest()
        version = int(man["version"]) if version is None else int(version)
        self._manifest_at(version)  # must exist and still be readable
        refs = dict(man.get("refs", {}))
        if name in refs:
            raise SinkCommitError(
                f"tag {name!r} already exists (points at version {refs[name]})"
            )
        refs[name] = version
        man_new = dict(man)
        man_new["version"] = man["version"] + 1
        man_new["refs"] = refs
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)
        return version

    def drop_tag(self, name: str) -> None:
        """Remove a tag; its version re-enters the normal GC policy."""
        man = self._require_manifest()
        refs = dict(man.get("refs", {}))
        if name not in refs:
            raise SinkCommitError(f"tag {name!r} does not exist")
        del refs[name]
        man_new = dict(man)
        man_new["version"] = man["version"] + 1
        man_new["refs"] = refs
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)

    def tags(self) -> dict[str, int]:
        return dict(self._require_manifest().get("refs", {}))

    def resolve_tag(self, name: str) -> int:
        refs = self._require_manifest().get("refs", {})
        if name not in refs:
            raise SinkCommitError(f"tag {name!r} does not exist")
        return int(refs[name])

    def rollback(self, version: int) -> int:
        """Restore the table to a past ``version`` as a NEW commit (Iceberg
        ``rollback_to_snapshot`` analog). Metadata-only: the new manifest
        re-references the old version's data dirs verbatim — no file is
        copied or rewritten, so rollback of a petabyte table is one JSON
        swap under the same CAS guard as any commit. Everything the old
        snapshot pinned is restored together: buckets, row estimates, zone
        maps, schema, job state, the batch guard and lineage — so a replay
        from checkpoint RE-APPLIES the rolled-back batches (their guard
        entries are gone with the rollback, matching Iceberg semantics where
        un-committed-by-rollback data must be re-ingested). The forward
        history is retained for audit: rolling back v5→v2 produces v6 whose
        content equals v2, and v3..v5 stay time-travelable until expired.
        Returns the new version number; rolling back to the current version
        is a no-op returning the current version."""
        man = self._require_manifest()
        if version == man["version"]:
            return int(man["version"])
        old = self._manifest_at(version)  # validates readability / expiry
        man_new = dict(old)
        man_new["version"] = man["version"] + 1
        # tags are table-level refs, not snapshot content: they survive a
        # rollback (Iceberg parity — rollback_to_snapshot keeps refs);
        # likewise table properties (retention policy etc.) — a rollback
        # must never silently revert retain_history and let the next commit
        # GC the very window the rollback relies on
        man_new["refs"] = dict(man.get("refs", {}))
        man_new["properties"] = dict(man.get("properties", {}))
        self._stamp_published(man_new, man)
        # layout fields travel with the restored snapshot (a rollback across
        # a rebucket restores the OLD bucket count — readers take n_buckets
        # from the manifest, so this is just another layout evolution)
        self._swap_manifest(man_new)
        self.n_buckets = int(man_new["n_buckets"])
        return int(man_new["version"])

    def history(self) -> list[dict]:
        """Commit log (Iceberg snapshot-list analog): one driver-side dict per
        retained manifest version, oldest first — version, per-job committed
        batch ids, live row count and readability under the GC policy."""
        man = self._require_manifest()
        hdir = os.path.join(self.root, "history")
        out: list[dict] = []
        names = sorted(
            (n for n in (os.listdir(hdir) if os.path.isdir(hdir) else [])
             if n.startswith("manifest.v")),
            key=lambda n: int(n[len("manifest.v"):-len(".json")]),
        )
        for name in names:
            with open(os.path.join(hdir, name), "r", encoding="utf-8") as fh:
                m = json.load(fh)
            if int(m["version"]) > man["version"]:
                continue  # orphan pre-swap snapshot of a crashed commit
            readable = all(
                os.path.isdir(os.path.join(self.root, rel))
                for b in m["buckets"]
                for rel in self._dirs_of(m, b)
            )
            out.append(
                {
                    "version": m["version"],
                    "committed_at_ms": m.get("committed_at_ms"),
                    "committed": dict(m["committed"]),
                    "total_rows": sum(int(v) for v in m.get("bucket_rows", {}).values()),
                    "n_buckets_live": len(m["buckets"]),
                    "is_current": m["version"] == man["version"],
                    "readable": readable,
                }
            )
        return out

    # ---- A18/A19/A20 ------------------------------------------------------

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    def ensure(self, schema: T.StructType) -> None:
        """CREATE TABLE IF NOT EXISTS (parity: ``CKANLoader.create_resource``
        + ``create_datastore(fields, primary_key=key_fields)``)."""
        if self.exists():
            return
        for k in self.keys:
            if k not in schema.fieldNames():
                raise SinkCommitError(f"key column {k!r} missing from schema {schema.fieldNames()}")
        reserved = [c for c in schema.fieldNames() if c in RESERVED_COLS]
        if reserved:
            raise SinkCommitError(
                f"column name(s) {reserved} are reserved for engine "
                f"internals ({list(RESERVED_COLS)})"
            )
        os.makedirs(self.root, exist_ok=True)
        self._swap_manifest(
            {
                "format": MANIFEST_FORMAT,
                "version": 0,
                "n_buckets": self.n_buckets,
                "keys": self.keys,
                "bucket_keys": self.bucket_keys,
                "schema": schema.jsonValue(),
                "buckets": {},
                "bucket_rows": {},
                "bucket_zones": {},
                "committed": {},
                "state": {},
                "lineage": [],
                "properties": {},
            }
        )

    def truncate(self) -> None:
        """Full-refresh reset (parity: ``CKANLoader.delete_datastore`` used by
        ``method='insert'``). Keeps the schema, drops data + guard state."""
        man = self._require_manifest()
        base = dict(man)
        man["version"] += 1
        man["buckets"] = {}
        man["bucket_rows"] = {}
        man["bucket_zones"] = {}
        man["committed"] = {}
        man["state"] = {}
        man["lineage"] = []
        self._stamp_published(man, base)
        self._swap_manifest(man)
        self._gc_orphans(man)

    def _require_manifest(self) -> dict:
        man = self._read_manifest()  # restores keys/bucket_keys (see there)
        if man is None:
            raise SinkCommitError(f"table does not exist at {self.root} (call ensure() first)")
        return man

    # ---- read paths ---------------------------------------------------------

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self._require_manifest()["schema"])

    def _full_schema(self, man: dict) -> T.StructType:
        s = T.StructType.fromJson(man["schema"])
        return T.StructType(
            list(s.fields)
            + [T.StructField("_seq", T.LongType()), T.StructField("_op", T.StringType())]
        )

    def _read_buckets(self, man: dict, buckets: list[int] | None = None) -> DataFrame:
        """Raw rows (incl. tombstones, superseded delta versions and internal
        cols) for the given buckets (None = all). Old files missing
        newly-evolved columns are null-filled by the explicit read schema —
        that is the additive-evolution read path (B9).
        """
        full = self._full_schema(man)
        ids = list(man["buckets"]) if buckets is None else [
            str(b) for b in buckets if str(b) in man["buckets"]
        ]
        dirs = [os.path.join(self.root, rel) for b in ids for rel in self._dirs_of(man, b)]
        if not dirs:
            return self.spark.createDataFrame([], full)
        return self.spark.read.schema(full).parquet(*dirs)

    def _has_deltas(self, man: dict, buckets: list[int] | None = None) -> bool:
        ids = man["buckets"] if buckets is None else [str(b) for b in buckets]
        return any(len(self._dirs_of(man, b)) > 1 for b in ids)

    def _latemat_lww(self, dirs: list[str], full: T.StructType, est_rows: int) -> DataFrame:
        """LWW resolution over parquet dirs with LATE MATERIALIZATION — the
        read-side twin of merge()'s plan: the reduce runs on narrow metadata
        (keys, _seq, _op, row id) from its own column-pruned scan; winning
        row ids then join back to a second, full-width scan, so payload bytes
        never enter the LWW shuffle. Row ids agree across the two scans
        because file-split planning and in-split row order are independent of
        the projected columns (same contract merge() uses for current rows).
        """
        wide = (
            self.spark.read.schema(full).parquet(*dirs)
            .withColumn("_rid", F.monotonically_increasing_id())
        )
        meta = (
            self.spark.read.schema(full).parquet(*dirs)
            .select(*self.keys, "_seq", "_op")
            .withColumn("_rid", F.monotonically_increasing_id())
        )
        rid_set = _lww_reduce(meta, self.keys).select("_rid")
        if est_rows <= self.broadcast_threshold_rows:
            return wide.join(F.broadcast(rid_set), "_rid").drop("_rid")
        # uniform synthetic key: shuffle-hash, never sort-merge
        return wide.join(rid_set.hint("SHUFFLE_HASH"), "_rid").drop("_rid")

    def _resolved(self, man: dict, buckets: list[int] | None = None) -> DataFrame:
        """One live version per key. Buckets WITHOUT a delta chain are read
        resolution-free and unioned around the LWW — one straggler delta no
        longer drags every payload byte of a mostly-compacted table through
        the reduce; only delta-bearing buckets resolve, and they resolve
        late-materialized (payloads skip the shuffle there too)."""
        ids = list(man["buckets"]) if buckets is None else [
            str(b) for b in buckets if str(b) in man["buckets"]
        ]
        delta_ids = [b for b in ids if len(self._dirs_of(man, b)) > 1]
        clean_ids = [b for b in ids if len(self._dirs_of(man, b)) == 1]
        parts: list[DataFrame] = []
        if clean_ids:
            parts.append(self._read_buckets(man, clean_ids))
        if delta_ids:
            dirs = [
                os.path.join(self.root, rel)
                for b in delta_ids
                for rel in self._dirs_of(man, b)
            ]
            est = sum(int(man.get("bucket_rows", {}).get(b, 0)) for b in delta_ids)
            parts.append(self._latemat_lww(dirs, self._full_schema(man), est))
        if not parts:
            return self.spark.createDataFrame([], self._full_schema(man))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self, version: int | None = None, tag: str | None = None) -> DataFrame:
        """Table state (tombstones filtered, internal columns dropped).
        ``version`` time-travels to a past committed snapshot — readable for
        the last ``retain_history`` versions (GC policy); expired versions
        raise instead of reading partially. ``tag`` reads a named pinned
        version (exempt from expiration until dropped)."""
        if tag is not None:
            if version is not None:
                raise SinkCommitError("pass version= or tag=, not both")
            version = self.resolve_tag(tag)
        man = self._manifest_at(version)
        return self._resolved(man).where(F.col("_op") != "D").drop(*INTERNAL_COLS)

    def read_pruned(self, buckets: list[int], version: int | None = None) -> DataFrame:
        """Table state restricted to the given bucket ids — the set-valued
        sibling of ``lookup()``: callers that already know which buckets
        their keys hash into (e.g. an incremental probe joining a small
        batch against a huge index) read ONLY those dirs, driver-side, no
        Spark job to plan the pruning. Unknown bucket ids are ignored
        (a rebucket may have changed the layout under the caller)."""
        man = self._manifest_at(version)
        return (
            self._resolved(man, [int(b) for b in buckets])
            .where(F.col("_op") != "D")
            .drop(*INTERNAL_COLS)
        )

    def read_pruned_for_keys(self, keys_df: DataFrame, version: int | None = None) -> DataFrame:
        """Table state restricted to the buckets a keys DataFrame hashes
        into — the shared probe idiom (near-dup index, patch baseline,
        trigram grep, SCD2 close): ONE ≤ n_buckets collect of bucket ids
        (never data rows), then a driver-side pruned read. The bucket
        count and bucket keys come from the manifest AT the requested
        version — a rebucket between versions would otherwise route keys
        to ids that layout never had. ``keys_df`` must carry the table's
        bucket-key columns; callers restrict rows further (semi join /
        filters) as needed."""
        man = self._manifest_at(version)
        bkeys = man.get("bucket_keys") or list(self.bucket_keys)
        hit = (
            keys_df.select(bucket_of(man["n_buckets"], list(bkeys)).alias("_b"))
            .distinct()
            .collect()
        )
        return self.read_pruned([int(r["_b"]) for r in hit], version=version)

    def _zone_survivors(self, man: dict, since_seq: int) -> list[int]:
        """Buckets that can contain a live row with _seq >= since_seq, by the
        manifest zone maps (driver-side, no Spark job). A bucket whose
        max_seq < since_seq cannot hold a winner at or past the cutoff (LWW
        winners only ever carry a _seq present in the bucket), so it is
        pruned before any file is listed. Missing zone entry (pre-zone-map
        manifest versions) → kept, conservatively."""
        zones = man.get("bucket_zones", {})
        return [
            int(b) for b in man["buckets"]
            if zones.get(b) is None or int(zones[b][1]) >= since_seq
        ]

    def modified_since(self, since_seq: int, version: int | None = None) -> DataFrame:
        """Incremental export (the Iceberg incremental-read analog, but on
        the CURRENT snapshot so it works past changelog retention): live rows
        whose winning version's event_sequence >= ``since_seq``. Zone maps
        prune entire buckets driver-side before the scan — a steady-state
        table where a trickle batch touched k of n buckets reads k dirs, not
        n. The residual ``_seq >= since_seq`` filter must run AFTER the LWW
        resolve (an old row may be the winner), so pruning — not pushdown —
        is the scale lever here."""
        man = self._manifest_at(version)
        keep = self._zone_survivors(man, since_seq)
        return (
            self._resolved(man, keep)
            .where(F.col("_op") != "D")
            .where(F.col("_seq") >= int(since_seq))
            .drop(*INTERNAL_COLS)
        )

    def lookup(self, repo: str | None = None, path: str | None = None,
               commit: str | None = None, **key_values) -> DataFrame:
        """Point lookup by bucket-key prefix — reads ONLY the one bucket the
        key hashes into (bucket pruning), then relies on parquet predicate
        pushdown inside that bucket's files. At n_buckets=4096 a lookup
        touches ~0.02% of the table. For non-default layouts pass the bucket
        keys (and any extra equality filters) as keyword args."""
        man = self._manifest_at(None)  # published view, like read()
        if repo is not None:
            key_values.setdefault("repo", repo)
        if path is not None:
            key_values.setdefault("path", path)
        if commit is not None:
            key_values.setdefault("commit", commit)
        bkeys = man.get("bucket_keys", self.bucket_keys)
        missing = [k for k in bkeys if k not in key_values]
        if missing:
            raise SinkCommitError(
                f"lookup needs every bucket key {bkeys}; missing {missing}"
            )
        # driver-side twin of the writer's JVM hash — no Spark job for a
        # point lookup (operators/xxhash.py, parity-tested). Spark's xxhash64
        # picks hashInt vs hashLong by COLUMN type, so the schema's type
        # names must ride along or an int-typed bucket key hashes wrong.
        from wprdc_etl_spark.operators.xxhash import bucket_of_py

        schema = T.StructType.fromJson(man["schema"])
        type_of = {f.name: f.dataType.simpleString() for f in schema.fields}
        bucket = bucket_of_py(
            man["n_buckets"],
            *[key_values[k] for k in bkeys],
            types=[type_of[k] for k in bkeys],
        )
        out = self._read_buckets(man, [bucket])
        # key-column filters partition the LWW groups → safe to push below
        # the reduce; any non-key filter must wait until versions resolve
        for k, v in key_values.items():
            if k in self.keys:
                out = out.where(F.col(k) == v)
        if self._has_deltas(man, [bucket]):
            out = _lww_reduce(out, self.keys)
        for k, v in key_values.items():
            if k not in self.keys:
                out = out.where(F.col(k) == v)
        return out.where(F.col("_op") != "D").drop(*INTERNAL_COLS)

    def changes_between(
        self,
        v_from: int,
        v_to: int | None = None,
        compare_cols: list[str] | None = None,
    ) -> DataFrame:
        """Incremental changelog (the Iceberg CDC-read analog): the NET
        row-level changes between two committed versions — ``change_op`` 'I'
        for keys new in ``v_to``, 'U' for keys whose compared payload
        changed, 'D' for keys gone. Downstream consumers resume by table
        version the same way the ingest side resumes by batch id; both
        endpoints read as snapshots, so the feed is exactly-once per version
        pair. Rows carry the ``v_to`` payload ('I'/'U') or the last ``v_from``
        payload ('D').

        Scale shape: ONE full-outer join of the two states projected to
        (keys + compared columns) — O(|a| + |b|) shuffle keyed like every
        other keyed op here. ``compare_cols`` defaults to ``content_sha``
        when the table has it (a 64-char compare instead of payload bytes),
        else every non-key column; keep it narrow and join payloads back by
        key downstream if consumers need them.
        """
        a_full = self.read(version=v_from)
        b_full = self.read(version=v_to)
        if compare_cols is None:
            common = [c for c in b_full.columns if c in a_full.columns and c not in self.keys]
            compare_cols = ["content_sha"] if "content_sha" in common else common
        return diff_states(a_full, b_full, self.keys, compare_cols)

    # ---- row-level DML verbs (Iceberg DELETE/UPDATE ... WHERE analogs) ----
    #
    # The reference's only row-level mutations arrive as upsert rows
    # (CKANDatastoreLoader method='upsert'); a lake table also needs
    # PREDICATE mutations — compliance deletes ("forget every row of repo X")
    # and backfill corrections — without synthesizing a change log by hand.
    # Both verbs compile the predicate to a tombstone/update batch and feed
    # the ordinary merge, so they inherit every merge property for free:
    # exactly-once batch guard, bucket-pruned rewrite (only buckets holding
    # matches are touched — COW rewrites them, MOR appends deltas), time
    # travel, changelog visibility, lineage, and CAS-protected commit.
    #
    # Sequencing: DML rows are stamped `event_sequence = _next_seq()`, one
    # past everything committed, entering the SAME total order as the change
    # log (Iceberg's serializable snapshot semantics, expressed in log
    # coordinates). A log replay resumed PAST a DML commit must carry higher
    # sequences to override it — same rule as any out-of-order CDC event.

    def _next_seq(self, man: dict) -> int:
        """Smallest sequence strictly above every committed row, from the
        manifest zone maps alone (driver-side, no Spark job). Zones are
        conservative — never narrower than the rows actually present — so
        ``max(zone hi) + 1`` outranks every stored version."""
        zones = man.get("bucket_zones", {})
        hi = max((int(z[1]) for z in zones.values() if z), default=-1)
        return hi + 1

    def delete_where(self, predicate, *, job: str = "__dml__") -> MergeResult:
        """``DELETE FROM table WHERE predicate`` — resolve the current state,
        keep only the KEY columns of matching rows (narrow: payload bytes
        never enter the delete batch), and merge them as 'D' tombstones one
        sequence past the committed max. Buckets with no matches are
        untouched; a key-column predicate additionally pushes down into the
        bucket scan."""
        man = self._require_manifest()
        seq = self._next_seq(man)
        # match against the STAGED HEAD, not the published view: the batch
        # commits on top of the head, so an open WAP chain's rows are in
        # scope (the delete itself stays staged until publish)
        matches = self.read_staged().where(predicate).select(*self.keys)
        batch = matches.withColumn("op", F.lit("D")).withColumn(
            "event_sequence", F.lit(seq).cast("long")
        )
        last = self.last_committed_batch(job)
        return self.merge(batch, job=job, batch_id=0 if last is None else last + 1)

    def update_where(self, predicate, assignments: dict, *, job: str = "__dml__") -> MergeResult:
        """``UPDATE table SET col = expr WHERE predicate``. ``assignments``
        maps column name → Column (or SQL-string) expression evaluated
        against the matching row. Key/bucket columns cannot be assigned —
        bucket routing hashes their values, so changing one is a
        delete+insert, not an update (same rule merge enforces for type
        changes). Only matching rows ride the batch; the merge late-
        materializes and rewrites only their buckets."""
        man = self._require_manifest()
        bad = [c for c in assignments
               if c in set(self.keys) | set(man.get("bucket_keys", self.bucket_keys))]
        if bad:
            raise SinkCommitError(
                f"update_where cannot assign key/bucket columns {bad}: changing "
                f"a key re-routes the row; delete_where + a fresh upsert instead"
            )
        table_cols = set(T.StructType.fromJson(man["schema"]).fieldNames())
        unknown = [c for c in assignments if c not in table_cols]
        if unknown:
            raise SinkCommitError(f"update_where on unknown columns {unknown}")
        gens = man.get("properties", {}).get("generated", {})
        genbad = sorted(set(assignments) & set(gens))
        if genbad:
            raise SinkCommitError(
                f"update_where cannot assign generated columns {genbad}: "
                f"they are recomputed from their expression at merge time"
            )
        seq = self._next_seq(man)
        matches = self.read_staged().where(predicate)  # head, as in delete_where
        # SQL UPDATE semantics: every RHS is evaluated against the OLD row,
        # exactly like IcebergTable.update_where's single MERGE SET list.
        # One select — chained withColumn would feed earlier assignments
        # into later ones and make the result depend on dict order.
        assigned = {
            name: (F.expr(expr) if isinstance(expr, str) else expr)
            for name, expr in assignments.items()
        }
        matches = matches.select(
            *[
                assigned[c].alias(c) if c in assigned else F.col(c)
                for c in matches.columns
            ]
        )
        batch = matches.withColumn("op", F.lit("U")).withColumn(
            "event_sequence", F.lit(seq).cast("long")
        )
        # generated columns ride OUT of the batch: the carried value is the
        # OLD image's and would go stale when an assigned source column
        # changes — merge() recomputes from the new image instead
        drop_gens = [g for g in gens if g in batch.columns]
        if drop_gens:
            batch = batch.drop(*drop_gens)
        last = self.last_committed_batch(job)
        return self.merge(batch, job=job, batch_id=0 if last is None else last + 1)

    _DUP_SRC_MARK = "MERGE-INTO-DUPLICATE-SOURCE-KEY"

    def merge_into(
        self,
        source: DataFrame,
        *,
        when_matched_update: dict | str | None = None,
        update_condition: Column | str | None = None,
        when_matched_delete: bool = False,
        delete_condition: Column | str | None = None,
        when_not_matched_insert: dict | str | None = None,
        insert_condition: Column | str | None = None,
        job: str = "__dml__",
    ) -> MergeResult:
        """Generic ``MERGE INTO table t USING source s ON <table keys>`` —
        the Delta/Iceberg multi-clause merge, compiled onto the guarded CDC
        merge (so CHECK constraints, WAP staging, exactly-once and bucket
        pruning all apply unchanged). The ON condition is fixed to key
        equality: the table's LWW identity IS its merge identity — an
        arbitrary ON would produce rows the engine cannot address.

        Clauses (each optional, at least one required):

        - ``when_matched_delete`` (+ ``delete_condition``): matched rows
          (satisfying the condition) become 'D' tombstones. Evaluated FIRST
          — a row claimed by delete is not seen by update (fixed clause
          order; Delta's ordered WHEN list collapsed to delete-then-update).
        - ``when_matched_update``: ``{col: expr}`` or ``"all"``. Exprs (SQL
          strings or Columns) see BOTH sides as ``s.<col>`` / ``t.<col>``;
          unassigned table columns carry the old value. ``"all"`` assigns
          every non-key table column present in the source from ``s``.
        - ``when_not_matched_insert``: ``{col: expr}`` (over ``s`` only) or
          ``"all"`` (source columns by name, absent table columns null).

        Assignments cannot target key/bucket columns (update_where's rule)
        and must target existing table columns — schema evolution stays on
        the ingest path. Duplicate source rows for one key whose actions
        survive their clause conditions are rejected (Delta's multiple-
        source-rows-match error): two same-key rows in one batch would tie
        on the LWW order key and resolve arbitrarily. The guard rides the
        batch's event_sequence expression (same zero-extra-scan idiom as
        CHECK constraints), so it costs one window over the source-sized
        batch, not an extra action.
        """
        man = self._require_manifest()
        if when_matched_update is None and not when_matched_delete \
                and when_not_matched_insert is None:
            raise SinkCommitError("merge_into needs at least one clause")
        for cond, clause_on, name in (
            (update_condition, when_matched_update is not None, "update_condition"),
            (delete_condition, when_matched_delete, "delete_condition"),
            (insert_condition, when_not_matched_insert is not None, "insert_condition"),
        ):
            if cond is not None and not clause_on:
                raise SinkCommitError(f"merge_into: {name} given without its clause")
        table_schema = T.StructType.fromJson(man["schema"])
        table_cols = table_schema.fieldNames()
        keyish = set(self.keys) | set(man.get("bucket_keys", self.bucket_keys))
        gens = man.get("properties", {}).get("generated", {})
        missing = [k for k in self.keys if k not in source.columns]
        if missing:
            raise SinkCommitError(f"merge_into source missing key columns {missing}")

        def _norm_assign(clause, which: str) -> dict:
            if clause == "all":
                # source columns by name; a table column absent from the
                # source keeps the target value (update) / null-fills (insert)
                # via _image's fallbacks; generated columns excluded — the
                # merge recomputes them from the new image
                clause = {
                    c: F.col(f"s.{c}")
                    for c in table_cols
                    if c not in self.keys and c not in gens and c in source.columns
                }
            genbad = sorted(set(clause) & set(gens))
            if genbad:
                raise SinkCommitError(
                    f"merge_into {which} cannot assign generated columns "
                    f"{genbad}: they are recomputed from their expression"
                )
            bad = sorted(set(clause) & keyish)
            if bad:
                raise SinkCommitError(
                    f"merge_into {which} cannot assign key/bucket columns {bad}"
                )
            unknown = sorted(set(clause) - set(table_cols))
            if unknown:
                raise SinkCommitError(
                    f"merge_into {which} targets unknown columns {unknown}"
                )
            return {
                c: (F.expr(v) if isinstance(v, str) else v)
                for c, v in clause.items()
            }

        def _cond(c) -> Column:
            if c is None:
                return F.lit(True)
            return F.expr(c) if isinstance(c, str) else c

        # match against the staged head (same scope as update/delete_where)
        tgt = self.read_staged().alias("t")
        src = source.alias("s")
        on = [F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in self.keys]
        branches: list[DataFrame] = []

        def _image(df: DataFrame, assigned: dict, op: str, side: str) -> DataFrame:
            cols = []
            for f in table_schema.fields:
                if f.name in gens:
                    continue  # recomputed by merge() from the new image
                if f.name in self.keys:
                    cols.append(F.col(f"s.{f.name}").cast(f.dataType).alias(f.name))
                elif op == "D":
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                elif f.name in assigned:
                    cols.append(assigned[f.name].cast(f.dataType).alias(f.name))
                elif side == "t":
                    cols.append(F.col(f"t.{f.name}").cast(f.dataType).alias(f.name))
                else:  # insert of a column the clause didn't set
                    cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            return df.select(*cols, F.lit(op).alias("op"))

        if when_matched_delete or when_matched_update is not None:
            matched = src.join(tgt, on, "inner")
            claimed = F.lit(False)
            if when_matched_delete:
                dcond = _cond(delete_condition)
                branches.append(_image(matched.where(dcond), {}, "D", "t"))
                claimed = F.coalesce(dcond, F.lit(False))
            if when_matched_update is not None:
                assigned = _norm_assign(when_matched_update, "update")
                ucond = _cond(update_condition) & ~claimed
                branches.append(_image(matched.where(ucond), assigned, "U", "t"))
        if when_not_matched_insert is not None:
            assigned = _norm_assign(when_not_matched_insert, "insert")
            unmatched = src.join(tgt, on, "left_anti").alias("s")
            branches.append(
                _image(unmatched.where(_cond(insert_condition)), assigned, "I", "s")
            )

        batch = branches[0]
        for b in branches[1:]:
            batch = batch.unionByName(b)
        seq = self._next_seq(man)
        # duplicate-source-key guard: branches are key-disjoint by
        # construction, so >1 row per key in the final batch ⟺ duplicate
        # keys in the source. assert_true rides event_sequence (prune-proof).
        from pyspark.sql.window import Window as _W

        n_per_key = F.count(F.lit(1)).over(_W.partitionBy(*self.keys))
        guard = F.assert_true(
            n_per_key == 1,
            F.lit(f"{self._DUP_SRC_MARK}: merge_into source has multiple rows "
                  f"for one key group — the merge would be ambiguous"),
        )
        batch = batch.withColumn(
            "event_sequence",
            F.when(guard.isNull(), F.lit(seq)).cast("long"),
        )
        last = self.last_committed_batch(job)
        try:
            return self.merge(batch, job=job, batch_id=0 if last is None else last + 1)
        except SinkCommitError:
            raise
        except Exception as e:
            if self._DUP_SRC_MARK in str(e):
                raise SinkCommitError(
                    "merge_into rejected: the source has multiple rows for one "
                    "key group (ambiguous merge) — nothing was committed"
                ) from e
            raise

    def read_lineage(self) -> DataFrame:
        man = self._require_manifest()
        dirs = [os.path.join(self.root, rel) for rel in man["lineage"]]
        if not dirs:
            return self.spark.createDataFrame([], self.LINEAGE_SCHEMA)
        return self.spark.read.schema(self.LINEAGE_SCHEMA).parquet(*dirs)

    def last_committed_batch(self, job: str) -> int | None:
        man = self._read_manifest()
        if not man:
            return None
        return man["committed"].get(job)

    def job_state(self, job: str) -> dict:
        man = self._require_manifest()
        return dict(man["state"].get(job, {}))

    def properties(self) -> dict:
        return dict(self._require_manifest()["properties"])

    def current_version(self) -> int | None:
        """Latest committed table version (None before the first commit) —
        the resume token downstream incremental consumers (RollupView,
        changelog feeds) store and pass back to ``changes_between``."""
        man = self._read_manifest()
        return None if man is None else man["version"]

    # ---- CHECK constraints (Delta ADD CONSTRAINT / Iceberg data-quality
    # gate analog) -------------------------------------------------------------
    #
    # Constraints are a persisted TABLE PROPERTY (like retain_history): any
    # handle — CLI, follower, DML verb — enforces them, not just the job that
    # added them. Enforcement is embedded into the merge batch's
    # event_sequence expression via assert_true, so it rides the merge's
    # FIRST action with zero extra scans and cannot be column-pruned away
    # (event_sequence is the LWW ordering — always read). A violation fails
    # the job before the atomic manifest swap, so nothing commits. SQL CHECK
    # semantics: NULL satisfies (unknown is not false); 'D' tombstones are
    # exempt (they carry null payloads by contract); a constraint whose
    # columns are absent from a batch is skipped for that batch — additive
    # evolution null-fills new rows (NULL passes) and survivors keep values
    # that passed at their own write time.

    _CHECK_MARK = "CHECK-CONSTRAINT-VIOLATION"
    _GEN_MARK = "GENERATED-COLUMN-VIOLATION"

    # ---- generated columns (Delta GENERATED ALWAYS AS analog) ---------------

    def generated_columns(self) -> dict[str, str]:
        return dict(
            self._require_manifest().get("properties", {}).get("generated", {})
        )

    def add_generated_column(self, name: str, expr: str) -> None:
        """``ALTER TABLE ADD COLUMN name GENERATED ALWAYS AS (expr)`` —
        Delta's generated columns, generalized: the column may be added to a
        NON-EMPTY table, in which case existing rows are backfilled in the
        SAME commit via the compact machinery (property + schema + data in
        one atomic swap — a crash can't leave the property without the
        backfill). Enforcement lives in merge(): a batch NOT carrying the
        column computes it at merge time (the normal CDC feed), a batch
        carrying it (an external producer materializing the column) is
        equality-asserted and rejected atomically on mismatch (Delta's
        write-time check), and a batch lacking the expression's source
        columns falls back to the ordinary null-fill contract. Internal
        rewriting verbs (update_where / merge_into) DROP the column from
        their batches so it is recomputed from the new row image."""
        man = self._require_manifest()
        gens = dict(man["properties"].get("generated", {}))
        if name in gens:
            raise SinkCommitError(
                f"generated column {name!r} already declared: ({gens[name]})"
            )
        keyish = set(self.keys) | set(man.get("bucket_keys", self.bucket_keys))
        if name in keyish:
            raise SinkCommitError(
                f"generated column cannot be a key/bucket column: {name!r}"
            )
        schema = T.StructType.fromJson(man["schema"])
        if name in schema.fieldNames():
            raise SinkCommitError(
                f"{name!r} is already a table column; generated columns must "
                f"be new (converting data columns would overwrite stored values)"
            )
        try:
            probe = self.read().select(F.expr(expr).alias(name))
        except Exception as e:  # AnalysisException and friends
            raise SinkCommitError(
                f"generated expression {expr!r} does not analyze against "
                f"the table schema: {e}"
            ) from e
        man2 = dict(man)
        man2["properties"] = {**man["properties"], "generated": {**gens, name: expr}}
        if man["buckets"]:
            df = self._resolved(man).withColumn(
                name, F.when(F.col("_op") != "D", F.expr(expr))
            )
            man2["schema"] = T.StructType(
                list(schema.fields)
                + [T.StructField(name, probe.schema[0].dataType, True)]
            ).jsonValue()
            self._rewrite_all(man2, df, man["n_buckets"])
        else:
            # empty table: property-only commit; the column enters the
            # schema via ordinary additive evolution at the first merge
            man2["version"] = man["version"] + 1
            self._stamp_published(man2, man)
            self._swap_manifest(man2)

    def drop_column(self, name: str) -> None:
        """``ALTER TABLE DROP COLUMN`` — metadata-only, Iceberg semantics:
        the column leaves the schema in one commit; readers stop projecting
        it instantly (old files keep the bytes until the next rewrite of
        their bucket — ``compact()``/``rebucket()`` read through the schema
        and physically shed them). The name is TOMBSTONED in the
        ``dropped_columns`` property: a batch still carrying it (a producer
        lagging the DDL) has the column silently ignored, and additive
        evolution can never re-add it — this closes the name-based-parquet
        resurrection hazard (re-adding the name would surface the old bytes
        still sitting in unrewritten files; Iceberg survives that via field
        ids, Delta via column mapping — a name-addressed layout must simply
        retire the name; re-introduce the data under a fresh name).
        Dropping a column referenced by a CHECK constraint or a generated
        expression is rejected (drop those first). Time travel still shows
        the column for pre-drop versions (each history manifest carries its
        own schema)."""
        man = self._require_manifest()
        if name in set(self.keys) | set(man.get("bucket_keys", self.bucket_keys)):
            raise SinkCommitError(f"cannot drop key/bucket column {name!r}")
        schema = T.StructType.fromJson(man["schema"])
        if name not in schema.fieldNames():
            raise SinkCommitError(f"column {name!r} does not exist")
        gens = man["properties"].get("generated", {})
        if name in gens:
            raise SinkCommitError(
                f"{name!r} is a generated column — drop_generated_column first"
            )
        remaining = self.read().drop(name)
        for kind, exprs in (("generated", gens),
                            ("constraint", man["properties"].get("constraints", {}))):
            for ename, expr in exprs.items():
                try:
                    remaining.select(F.expr(expr))
                except Exception as e:
                    raise SinkCommitError(
                        f"cannot drop {name!r}: {kind} {ename!r} ({expr}) "
                        f"references it"
                    ) from e
        man_new = dict(man)
        man_new["version"] = man["version"] + 1
        man_new["schema"] = T.StructType(
            [f for f in schema.fields if f.name != name]
        ).jsonValue()
        dropped = list(man["properties"].get("dropped_columns", []))
        man_new["properties"] = {
            **man["properties"], "dropped_columns": dropped + [name],
        }
        # a z-order layout referencing the dropped column shrinks to the
        # surviving columns in the same commit (it's a layout heuristic,
        # not a schema surface) — otherwise the next scheduled
        # compact()/rebucket() would fail resolving the stale property
        zcols = man["properties"].get("zorder_by") or []
        if name in zcols:
            man_new["properties"]["zorder_by"] = [c for c in zcols if c != name]
            zstats = man["properties"].get("zorder_stats") or {}
            man_new["properties"]["zorder_stats"] = {
                c: v for c, v in zstats.items() if c != name
            }
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)

    def drop_generated_column(self, name: str) -> None:
        """Stop generating; stored values stay as ordinary data (Delta
        parity — dropping the expression, not the column)."""
        man = self._require_manifest()
        gens = dict(man["properties"].get("generated", {}))
        if name not in gens:
            raise SinkCommitError(f"generated column {name!r} does not exist")
        del gens[name]
        man_new = dict(man)
        man_new["version"] = man["version"] + 1
        man_new["properties"] = {**man["properties"], "generated": gens}
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)

    def _with_generated(self, batch: DataFrame, gens: dict[str, str]) -> DataFrame:
        """Compute / verify generated columns on a merge batch. Same
        zero-extra-action idiom as CHECK constraints: the verify assert
        rides the batch's event_sequence expression. 'D' tombstones are
        exempt both ways (their payload is null by the merge contract)."""
        from pyspark.errors import AnalysisException

        # Fixed-point pass order, not alphabetical: a generated column may
        # reference ANOTHER generated column (add-time probes against read()
        # allow it), so a single sorted sweep would silently null-fill any
        # dependent that sorts before its dependency. Retry until no column
        # makes progress; only then do the survivors take the null-fill
        # contract (their source columns are genuinely absent).
        pending = dict(gens)
        progress = True
        while pending and progress:
            progress = False
            for name in sorted(pending):
                expr = F.expr(pending[name])
                try:
                    batch.select(expr)  # eager analysis: sources present?
                except AnalysisException:
                    continue  # maybe a later generated column provides them
                if name not in batch.columns:
                    batch = batch.withColumn(
                        name, F.when(F.col("op") != "D", expr)
                    )
                else:
                    ok = (F.col("op") == "D") | F.col(name).eqNullSafe(expr)
                    msg = (
                        f"{self._GEN_MARK}: generated column {name!r} = "
                        f"({pending[name]}) violated by a merge batch row"
                    )
                    batch = batch.withColumn(
                        "event_sequence",
                        F.when(
                            F.assert_true(ok, F.lit(msg)).isNull(),
                            F.col("event_sequence"),
                        ).cast("long"),
                    )
                del pending[name]
                progress = True
        return batch

    # ---- CHECK constraints --------------------------------------------------

    def constraints(self) -> dict[str, str]:
        return dict(
            self._require_manifest().get("properties", {}).get("constraints", {})
        )

    def add_constraint(self, name: str, expr: str) -> None:
        """``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``: validates the
        CURRENT state in one scan (Delta parity — a constraint the existing
        rows violate is rejected), then commits the property metadata-only."""
        man = self._require_manifest()
        cons = dict(man["properties"].get("constraints", {}))
        if name in cons:
            raise SinkCommitError(
                f"constraint {name!r} already exists: CHECK ({cons[name]})"
            )
        try:
            bad = (
                self.read()
                .where(~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)))
                .count()
            )
        except Exception as e:  # AnalysisException and friends
            raise SinkCommitError(
                f"constraint expression {expr!r} does not analyze against "
                f"the table schema: {e}"
            ) from e
        if bad:
            raise SinkCommitError(
                f"cannot add constraint {name!r}: {bad} existing row(s) "
                f"violate CHECK ({expr})"
            )
        cons[name] = expr
        man_new = dict(man)
        man_new["version"] = man["version"] + 1
        man_new["properties"] = {**man["properties"], "constraints": cons}
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)

    def drop_constraint(self, name: str) -> None:
        man = self._require_manifest()
        cons = dict(man["properties"].get("constraints", {}))
        if name not in cons:
            raise SinkCommitError(f"constraint {name!r} does not exist")
        del cons[name]
        man_new = dict(man)
        man_new["version"] = man["version"] + 1
        man_new["properties"] = {**man["properties"], "constraints": cons}
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)

    def _with_constraint_checks(
        self, batch: DataFrame, cons: dict[str, str]
    ) -> DataFrame:
        from pyspark.errors import AnalysisException

        seq = F.col("event_sequence").cast("long")
        wrapped = False
        for name in sorted(cons):
            ok = F.coalesce(F.expr(cons[name]).cast("boolean"), F.lit(True))
            try:
                batch.select(ok)  # eager analysis: resolvable against batch?
            except AnalysisException:
                continue  # column absent from this batch: skipped (see note)
            cond = (F.col("op") == "D") | ok
            msg = (
                f"{self._CHECK_MARK}: constraint {name!r} "
                f"CHECK ({cons[name]}) violated by a merge batch row"
            )
            # assert_true is NULL when cond holds, raises otherwise; the
            # when() keeps seq's value while forcing the assert to evaluate
            seq = F.when(F.assert_true(cond, F.lit(msg)).isNull(), seq)
            wrapped = True
        if not wrapped:
            return batch
        return batch.withColumn("event_sequence", seq.cast("long"))

    # ---- the MERGE (B7) -----------------------------------------------------

    def merge(
        self,
        batch_df: DataFrame,
        *,
        job: str = "default",
        batch_id: int = 0,
        counts: LineageCounts | None = None,
        job_state: dict | None = None,
        properties: dict | None = None,
        finalize: Optional[Callable[[], tuple["LineageCounts", dict | None]]] = None,
        staged: bool = False,
    ) -> MergeResult:
        """Apply one batch, exactly once, enforcing the table's persisted
        CHECK constraints (see the constraints section above); the full
        merge contract is documented on ``_merge_impl``."""
        man = self._read_manifest()
        dropped = (man or {}).get("properties", {}).get("dropped_columns", [])
        stale = [c for c in dropped if c in batch_df.columns]
        if stale:
            # a producer lagging the DROP COLUMN DDL: the retired name is
            # ignored, and can never re-enter via additive evolution (the
            # name-resurrection hazard — see drop_column)
            batch_df = batch_df.drop(*stale)
        gens = (man or {}).get("properties", {}).get("generated", {})
        if gens:
            # before constraints: a CHECK may reference a generated column
            batch_df = self._with_generated(batch_df, gens)
        cons = (man or {}).get("properties", {}).get("constraints", {})
        if cons:
            batch_df = self._with_constraint_checks(batch_df, cons)
        try:
            return self._merge_impl(
                batch_df, job=job, batch_id=batch_id, counts=counts,
                job_state=job_state, properties=properties,
                finalize=finalize, staged=staged,
            )
        except (SinkCommitError, DuplicateBatchException):
            raise
        except Exception as e:
            if self._CHECK_MARK in str(e):
                import re as _re

                m = _re.search(
                    rf"{self._CHECK_MARK}: (constraint .*? violated by a "
                    rf"merge batch row)", str(e), _re.S,
                )
                detail = m.group(1).replace("\n", " ") if m else "constraint violated"
                raise SinkCommitError(
                    f"merge rejected: {detail} — nothing was committed"
                ) from e
            if self._GEN_MARK in str(e):
                import re as _re

                m = _re.search(
                    rf"{self._GEN_MARK}: (generated column .*? violated by a "
                    rf"merge batch row)", str(e), _re.S,
                )
                detail = m.group(1).replace("\n", " ") if m else "generated column violated"
                raise SinkCommitError(
                    f"merge rejected: {detail} — nothing was committed"
                ) from e
            raise

    def _merge_impl(
        self,
        batch_df: DataFrame,
        *,
        job: str = "default",
        batch_id: int = 0,
        counts: LineageCounts | None = None,
        job_state: dict | None = None,
        properties: dict | None = None,
        finalize: Optional[Callable[[], tuple["LineageCounts", dict | None]]] = None,
        staged: bool = False,
    ) -> MergeResult:
        """Apply one batch of change events, exactly once.

        ``staged=True`` commits write-audit-publish style: the version chain
        advances but readers keep resolving the published version until
        ``publish()`` (see the WAP section).

        ``batch_df`` must carry the key columns, ``op`` ('I'|'U'|'D'),
        ``event_sequence`` (long) and any payload columns. Payload columns
        not yet in the table schema are added (additive evolution, B9);
        table columns absent from the batch are null-filled for new rows and
        untouched for survivors.

        ``finalize``: optional callable resolved right after the first action
        on the batch — lets the caller derive (counts, job_state) from an
        ``Observation`` attached upstream, so batch accounting costs zero
        extra scans (see IngestJob.apply_batch).
        """
        man = self._require_manifest()
        last = man["committed"].get(job)
        if last is not None and batch_id <= last:
            if self.strict_duplicate_check:
                raise DuplicateBatchException(
                    f"batch {batch_id} for job {job!r} already committed (last={last})"
                )
            return MergeResult(applied=False, version=man["version"],
                               skipped_reason=f"batch<=last_committed({last})")

        table_schema = T.StructType.fromJson(man["schema"])

        # --- normalize batch → internal shape: payload + _seq + _op + _bucket
        batch = batch_df
        payload_cols = [c for c in batch.columns if c not in ("op", "event_sequence", "event_ts")]
        for k in self.keys:
            if k not in payload_cols:
                raise SinkCommitError(f"merge batch missing key column {k!r}")
        new_cols = [c for c in payload_cols if c not in table_schema.fieldNames()]
        bad = [c for c in new_cols if c in RESERVED_COLS]
        if bad:
            raise SinkCommitError(
                f"batch column name(s) {bad} are reserved for engine "
                f"internals and cannot evolve into the table"
            )
        # B9 evolution: additive columns append; shared columns may WIDEN
        # (byte/short/int->long, float->double — metadata-only under
        # SPARK-40876 parquet widening reads). Key/bucket columns must not
        # change type: bucket routing hashes their VALUES, and xxhash64 of
        # the same number at different widths is a different hash — a
        # widened key would silently strand existing rows in wrong buckets.
        keyish = set(self.keys) | set(man.get("bucket_keys", self.bucket_keys))
        evolved_fields: list[T.StructField] = []
        for f in table_schema.fields:
            if f.name in payload_cols and batch.schema[f.name].dataType != f.dataType:
                if f.name in keyish:
                    raise SinkCommitError(
                        f"type change on key/bucket column {f.name!r} "
                        f"({f.dataType.simpleString()} -> "
                        f"{batch.schema[f.name].dataType.simpleString()}) is not "
                        f"supported: bucket routing hashes key values, so a "
                        f"width change would re-route existing rows"
                    )
                evolved_fields.append(
                    T.StructField(
                        f.name,
                        _widen_type(f.name, f.dataType, batch.schema[f.name].dataType),
                        True,
                    )
                )
            else:
                evolved_fields.append(f)
        evolved_schema = T.StructType(
            evolved_fields + [batch.schema[c] for c in new_cols]
        )
        # ---- LATE MATERIALIZATION (the 10^10-event design) ----------------
        # Wide payloads (content can be KBs/row) must never ride a shuffle or
        # a sort they don't have to. The LWW resolution runs entirely on
        # NARROW metadata (keys, _seq, _op, a synthetic row id); the winning
        # row ids then join back (broadcast, or shuffle-hash for huge
        # batches) to late-materialize payloads — so payload bytes cross
        # exactly ONE exchange: the final bucketed write. Observed on a 10M-
        # event replay: the previous payload-through-sort plan got *slower*
        # with more cores (spill thrash); this plan scales.
        #
        # Row ids are monotonically_increasing_id over a shuffle-free,
        # deterministic subtree (scan → narrow projections), so the meta pass
        # and the materialization pass compute identical ids; batch ids are
        # odd and current-row ids even so the two sides never collide.
        #
        # CRITICAL pruning detail: monotonically_increasing_id is marked
        # non-deterministic, and Catalyst will not prune columns or push
        # filters through a non-deterministic projection — putting it above
        # the full-width row would force the "narrow" pass to materialize
        # every payload byte (measured 13× slower on a 10M-event scan). So
        # each pass projects its own columns FIRST and applies its own id
        # expression on top; ids still agree across passes because they are
        # a pure function of (file-split partitioning, row order), both of
        # which are independent of the selected columns.
        #
        # That contract holds ONLY for deterministic scan subtrees. A batch
        # whose plan contains a shuffle (repartition/aggregate/stateful dedup
        # — the streaming foreachBatch path) has no stable row order across
        # actions: the ids assigned by the metadata pass and the
        # materialization pass could disagree and the merge would silently
        # write superseded rows. _pin_batch detects those plans and pins the
        # batch with localCheckpoint so every pass reads ONE materialized rid
        # assignment (pruning no longer matters there: the rows are already
        # in block-manager memory).
        batch = self._pin_batch(batch)
        aligned = batch.select(
            *[
                (F.col(f.name).cast(f.dataType) if f.name in batch.columns else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in evolved_schema.fields
            ],
            F.col("event_sequence").cast("long").alias("_seq"),
            F.col("op").alias("_op"),
        )
        brows = aligned.withColumn("_rid", F.monotonically_increasing_id() * 2 + 1)
        bmeta = aligned.select(*self.keys, "_seq", "_op").withColumn(
            "_rid", F.monotonically_increasing_id() * 2 + 1
        )
        # Batch-local LWW on metadata (B4; also subsumes exact-redelivery
        # dedup — identical rows tie on the order key and max_by keeps one).
        # LWW is associative, so batch-local reduce then reduce-vs-current
        # equals one global reduce.
        import time as _time

        _dbg = os.environ.get("LAKE_DEBUG") == "1"
        _t0 = _time.monotonic()

        def _mark(label: str) -> None:
            nonlocal _t0
            if _dbg:
                now = _time.monotonic()
                print(f"[lake] {label}: {now - _t0:.1f}s", flush=True)
                _t0 = now

        bwin = _lww_reduce(bmeta, self.keys).withColumn(
            "_bucket", bucket_of(man["n_buckets"], man.get("bucket_keys", self.bucket_keys))
        )
        bwin = bwin.persist()
        extra_persists: list[DataFrame] = []
        try:
            stats = bwin.groupBy("_bucket").agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("_op") == "D", 1).otherwise(0)).alias("n_del"),
                F.min("_seq").alias("min_seq"),
                F.max("_seq").alias("max_seq"),
                F.sum(F.xxhash64(*self.keys, "_seq").cast("decimal(38,0)")).alias("h"),
            ).collect()
            _mark("stats(narrow LWW)")
            if finalize is not None:
                counts, job_state = finalize()
            counts = counts or LineageCounts()
            if not stats:
                return self._commit_empty(man, job, batch_id, counts, job_state, properties, staged=staged)

            affected = sorted(int(r["_bucket"]) for r in stats)
            batch_rows = sum(r["n"] for r in stats)
            populated = [b for b in affected if str(b) in man["buckets"]]
            old_rows = man.get("bucket_rows", {})
            current_rows = sum(int(old_rows.get(str(b), 0)) for b in affected)

            mode = self.write_mode
            if mode == "auto":
                mode = (
                    "mor"
                    if populated
                    and current_rows > 0
                    and batch_rows <= self.mor_batch_fraction * current_rows
                    else "cow"
                )

            if mode == "mor":
                return self._commit_mor(
                    man=man, job=job, batch_id=batch_id, counts=counts,
                    job_state=job_state, properties=properties,
                    brows=brows, bwin=bwin, stats=stats, affected=affected,
                    batch_rows=int(batch_rows), old_rows=old_rows,
                    evolved_schema=evolved_schema, mark=_mark, staged=staged,
                )

            if populated:
                current = self._read_buckets(man, populated)
                cur_aligned = current.select(
                    *[
                        (F.col(f.name) if f.name in current.columns else F.lit(None).cast(f.dataType)).alias(f.name)
                        for f in evolved_schema.fields
                    ],
                    "_seq",
                    "_op",
                )
                crows = cur_aligned.withColumn("_rid", F.monotonically_increasing_id() * 2)
                cmeta = current.select(*self.keys, "_seq", "_op").withColumn(
                    "_rid", F.monotonically_increasing_id() * 2
                )
                # final winners: batch winners vs current rows, narrow only
                fwin = _lww_reduce(bwin.drop("_bucket").unionByName(cmeta), self.keys)
                all_rows = brows.unionByName(crows)
                strategy_base = "latemat"
            else:
                fwin = bwin.drop("_bucket")
                all_rows = brows
                strategy_base = "append-only"

            # Materialization join, by expected set sizes:
            # - 'broadcast': winners fit a broadcast → semi join on _rid.
            # - 'copart' (bulk default): the winner-rid semi join RIDES the
            #   bucketed write exchange — both sides hash-partition on the
            #   write key, the join is partition-local. No driver-side set
            #   build at all (the 'anti' loser broadcast costs a measured
            #   25–45 s of driver-serial time at ~8M rids; here the hash
            #   maps build per-partition on executors) and nothing funnels
            #   through one node on a real cluster.
            # - 'anti': legacy bulk path — broadcast the LOSER rids
            #   (superseded versions, redeliveries), anti join.
            # - 'shuffle': shuffle-hash on _rid (uniform synthetic key).
            strategy = self.merge_strategy
            if strategy == "auto":
                strategy = (
                    "broadcast"
                    if (batch_rows + current_rows) <= self.broadcast_threshold_rows
                    else "copart"
                )
            rid_set = fwin.select("_rid")
            prepartitioned = False
            if strategy == "copart":
                # One payload exchange total: semi-join on (_bucket_dir, _rid)
                # — the join's own shuffle doubles as the write distribution
                # (rows land grouped by nothing but (bucket, rid) hash; the
                # partitionBy writer splits them into bucket dirs). Trades
                # the anti path's loser-count pass + driver-serial broadcast
                # build for per-partition executor-side hash builds, at the
                # cost of more (smaller) output files per commit.
                # NOTE: riding the bucketed write exchange with a subset-
                # co-partitioned join is NOT expressible — Catalyst hoists
                # user repartitions above joins and EnsureRequirements
                # demands full-join-key partitioning for co-partitioning.
                nb = man["n_buckets"]
                bkeys = man.get("bucket_keys", self.bucket_keys)
                bcol = bucket_of(nb, bkeys)
                wide = all_rows.withColumn("_bucket_dir", bcol)
                rids = fwin.select(bcol.alias("_bucket_dir"), "_rid")
                merged = wide.join(
                    rids.hint("SHUFFLE_HASH"), ["_bucket_dir", "_rid"], "left_semi"
                ).drop("_rid")
                prepartitioned = True
            if strategy == "anti":
                # Loser-broadcast vs payload-reshuffle crossover, MEASURED at
                # 20M events / 7.9M losers on this box: broadcast-anti write
                # 41.6s vs shuffle-semi write 86.3s at 8 threads — a rid-only
                # broadcast (8B/row, torrent-distributed) beats re-exchanging
                # every payload byte by ~2× even at millions of rids. The
                # limit caps the driver build (~8M rids ≈ 64MB ≈ sub-second
                # torrent); beyond it the payload reshuffle finally wins.
                loser_limit = max(4 * self.broadcast_threshold_rows, 8_000_000)
                # An upper bound on |losers| is often known without a count:
                # batch-side losers = (raw − quarantined − late) − reduced;
                # current-side losers ≤ min(current, reduced batch keys).
                # When the bound is known, the counting pass is skipped
                # entirely — one fewer narrow scan per micro-batch.
                n_raw = (counts.extra or {}).get("n_raw")
                bound = None
                if n_raw is not None:
                    n_valid = int(n_raw) - int(counts.rows_quarantined) - int(counts.rows_late)
                    bound = (n_valid - int(batch_rows)) + min(int(current_rows), int(batch_rows))
                all_rids = bmeta.select("_rid")
                if populated:
                    all_rids = all_rids.unionAll(cmeta.select("_rid"))
                losers = all_rids.join(rid_set, "_rid", "left_anti")
                if bound is not None and bound <= self.broadcast_threshold_rows:
                    # micro-batch regime: the counting action's fixed latency
                    # dominates — skip it, broadcast the (small) loser set
                    merged = all_rows.join(F.broadcast(losers), "_rid", "left_anti").drop("_rid")
                else:
                    # bulk regime: count+persist so the broadcast build reads
                    # the cached loser set instead of recomputing the anti
                    # join inside the write job (measured 98.6s vs 110.7s
                    # end-to-end at 20M events / 8 threads)
                    losers = losers.persist()
                    extra_persists.append(losers)
                    n_losers = losers.count()
                    _mark(f"losers({n_losers})")
                    if n_losers <= loser_limit:
                        merged = all_rows.join(F.broadcast(losers), "_rid", "left_anti").drop("_rid")
                    else:
                        strategy = "shuffle"
            if strategy == "broadcast":
                merged = all_rows.join(F.broadcast(rid_set), "_rid").drop("_rid")
            elif strategy == "shuffle":
                merged = all_rows.join(rid_set.hint("SHUFFLE_HASH"), "_rid").drop("_rid")
            strategy = f"{strategy_base}-{strategy}"

            version = man["version"] + 1
            # attempt dirs are token-unique: two optimistic writers sharing a
            # base version must never write the same path — a name collision
            # would let the LOSER's mode("overwrite") clobber the WINNER's
            # already-committed files even though its manifest CAS fails
            token = self._begin_attempt()
            data_rel = f"data/v{version}_w{token}"
            approx_rows = int(batch_rows) + current_rows
            self._write_bucketed(
                merged, os.path.join(self.root, data_rel), man["n_buckets"],
                approx_rows, prepartitioned=prepartitioned,
            )
            _mark(f"write({strategy})")

            lineage_rel = f"lineage/l{version}_w{token}"
            self._write_lineage(man, stats, job, batch_id, counts, os.path.join(self.root, lineage_rel))

            new_buckets = dict(man["buckets"])
            written = self._list_bucket_dirs(os.path.join(self.root, data_rel))
            for b in affected:
                if b in written:
                    # copy-on-write: the fresh dir REPLACES the bucket's whole
                    # base+delta chain
                    new_buckets[str(b)] = [f"{data_rel}/_bucket_dir={b}"]
            new_bucket_rows = dict(old_rows)
            new_zones = dict(man.get("bucket_zones", {}))
            # COW replaced each affected bucket's whole chain, so its row
            # count is exactly the new dir's — read it from parquet footers
            # (driver-side metadata). The old accumulate-only estimate
            # double-counted updates and, fed into the 'auto' policy's
            # current_rows, flipped steady-state tables to MOR on an
            # inflated table-size signal.
            exact = self._footer_rows(os.path.join(self.root, data_rel))
            for r in stats:
                b = str(int(r["_bucket"]))
                new_bucket_rows[b] = (
                    exact[int(b)]
                    if int(b) in exact
                    else int(old_rows.get(b, 0)) + int(r["n"])
                )
                new_zones[b] = _merge_zone(new_zones.get(b), r["min_seq"], r["max_seq"])
            man_new = dict(man)
            man_new["version"] = version
            man_new["schema"] = evolved_schema.jsonValue()
            man_new["buckets"] = new_buckets
            man_new["bucket_rows"] = new_bucket_rows
            man_new["bucket_zones"] = new_zones
            man_new["committed"] = {**man["committed"], job: batch_id}
            if job_state is not None:
                man_new["state"] = {**man["state"], job: job_state}
            if properties is not None:
                man_new["properties"] = {**man["properties"], **properties}
            man_new["lineage"] = list(man["lineage"]) + [lineage_rel]
            self._stamp_published(man_new, man, staged)
            committed = self._swap_manifest(
                man_new,
                rebase=lambda cur: self._rebase_commit(
                    man, man_new, cur, affected, job, batch_id, staged
                ),
            )
            self._gc_orphans(committed)
            return MergeResult(
                applied=True,
                version=committed["version"],
                rows_upserted=int(batch_rows - sum(r["n_del"] for r in stats)),
                rows_deleted=int(sum(r["n_del"] for r in stats)),
                n_affected_buckets=len(affected),
                strategy=strategy,
                rebased=committed is not man_new,
            )
        finally:
            bwin.unpersist()
            for df in extra_persists:
                df.unpersist()
            self._end_attempt()

    def _commit_mor(
        self,
        *,
        man: dict,
        job: str,
        batch_id: int,
        counts: LineageCounts,
        job_state: dict | None,
        properties: dict | None,
        brows: DataFrame,
        bwin: DataFrame,
        stats: list,
        affected: list[int],
        batch_rows: int,
        old_rows: dict,
        evolved_schema: T.StructType,
        mark,
        staged: bool = False,
    ) -> MergeResult:
        """Merge-on-read commit: write ONLY the batch winners as a bucketed
        delta (LSM memtable-flush analog — the current table is never read),
        then inline-compact any bucket whose delta chain exceeds
        ``max_deltas``. Both writes publish in the same atomic manifest swap.
        Write cost: O(batch) + amortized O(bucket/max_deltas) — vs COW's
        O(affected buckets) per batch.
        """
        version = man["version"] + 1
        token = self._begin_attempt()  # see the COW path: collision-proof dirs
        data_rel = f"data/v{version}_w{token}"
        merged = brows.join(F.broadcast(bwin.select("_rid")), "_rid").drop("_rid")
        self._write_bucketed(merged, os.path.join(self.root, data_rel), man["n_buckets"], batch_rows)
        mark("write(mor-delta)")

        written = self._list_bucket_dirs(os.path.join(self.root, data_rel))
        new_buckets = {k: self._dirs_of(man, k) for k in man["buckets"]}
        for b in affected:
            if b in written:
                new_buckets[str(b)] = new_buckets.get(str(b), []) + [f"{data_rel}/_bucket_dir={b}"]

        # Staggered compaction: with CDC batches that touch EVERY bucket, a
        # uniform "chain > max_deltas" trigger makes all chains cross the
        # limit in the SAME commit — a periodic all-bucket inline compaction,
        # i.e. a full-table-rewrite stall (the 10^9 replay anchor died of
        # exactly this colliding with disk headroom). Keep the hard bound
        # (chain never exceeds max_deltas+1), but also give each bucket a
        # round-robin cohort slot (version % max_deltas == bucket %
        # max_deltas) that compacts it early once its chain passes
        # the floor: at steady state ~1/max_deltas of the buckets compact
        # per commit, so write cost per commit is O(batch + table/max_deltas)
        # instead of a periodic O(table) spike. The floor is a CONSTANT 2,
        # not a max_deltas fraction: after any hard-bound compaction a
        # bucket's refill phase is off its slot, and a higher floor makes it
        # skip its next slot and hit the hard bound again — hard-bound sync
        # groups then persist and re-fire together (observed as recurring
        # multi-cohort compaction spikes at 10^9 scale). With floor 2 the
        # bucket re-pins to its slot on the next pass at the cost of one
        # cheap short-chain compaction.
        floor = 2
        overfull = [
            b
            for b, dirs in new_buckets.items()
            if len(dirs) > self.max_deltas
            or (
                len(dirs) > floor
                and version % self.max_deltas == int(b) % self.max_deltas
            )
        ]
        if overfull:
            full = T.StructType(
                list(evolved_schema.fields)
                + [T.StructField("_seq", T.LongType()), T.StructField("_op", T.StringType())]
            )
            dirs = [os.path.join(self.root, rel) for b in overfull for rel in new_buckets[b]]
            est = sum(int(old_rows.get(b, 0)) for b in overfull) + batch_rows
            resolved = self._latemat_lww(dirs, full, est)
            comp_rel = f"data/v{version}_w{token}_compact"
            self._write_bucketed(resolved, os.path.join(self.root, comp_rel), man["n_buckets"], est)
            cwritten = self._list_bucket_dirs(os.path.join(self.root, comp_rel))
            for b in overfull:
                if int(b) in cwritten:
                    new_buckets[b] = [f"{comp_rel}/_bucket_dir={b}"]
            mark(f"inline-compact({len(overfull)} buckets)")

        lineage_rel = f"lineage/l{version}_w{token}"
        self._write_lineage(man, stats, job, batch_id, counts, os.path.join(self.root, lineage_rel))

        new_bucket_rows = dict(old_rows)
        new_zones = dict(man.get("bucket_zones", {}))
        delta_exact = self._footer_rows(os.path.join(self.root, data_rel))
        for r in stats:
            b = str(int(r["_bucket"]))
            # delta append adds exactly the written rows (physical count,
            # superseded versions included — that is what read/compact cost)
            new_bucket_rows[b] = int(old_rows.get(b, 0)) + int(
                delta_exact.get(int(b), int(r["n"]))
            )
            new_zones[b] = _merge_zone(new_zones.get(b), r["min_seq"], r["max_seq"])
        if overfull:
            # compaction LWW-resolved these chains: reset to exact counts
            comp_exact = self._footer_rows(os.path.join(self.root, comp_rel))
            for b in overfull:
                if int(b) in comp_exact:
                    new_bucket_rows[b] = comp_exact[int(b)]
        man_new = dict(man)
        man_new["version"] = version
        man_new["schema"] = evolved_schema.jsonValue()
        man_new["buckets"] = new_buckets
        man_new["bucket_rows"] = new_bucket_rows
        man_new["bucket_zones"] = new_zones
        man_new["committed"] = {**man["committed"], job: batch_id}
        if job_state is not None:
            man_new["state"] = {**man["state"], job: job_state}
        if properties is not None:
            man_new["properties"] = {**man["properties"], **properties}
        man_new["lineage"] = list(man["lineage"]) + [lineage_rel]
        self._stamp_published(man_new, man, staged)
        committed = self._swap_manifest(
            man_new,
            rebase=lambda cur: self._rebase_commit(
                man, man_new, cur, affected, job, batch_id, staged
            ),
        )
        self._gc_orphans(committed)
        return MergeResult(
            applied=True,
            version=committed["version"],
            rows_upserted=int(batch_rows - sum(r["n_del"] for r in stats)),
            rows_deleted=int(sum(r["n_del"] for r in stats)),
            n_affected_buckets=len(affected),
            strategy=f"mor-delta+compact{len(overfull)}" if overfull else "mor-delta",
            rebased=committed is not man_new,
        )

    # ---- merge internals ----------------------------------------------------

    # Physical-plan markers whose presence means cross-action row order is
    # NOT reproducible (shuffles re-fetch blocks in arrival order; state
    # stores and samples depend on runtime). BroadcastExchange/AQE broadcast
    # stages are fine: a broadcast join streams its probe side in scan order.
    _ORDER_UNSTABLE_MARKERS = (
        "exchange", "shuffle", "statestore", "sample", "rand(", "inmemorytablescan",
    )

    @classmethod
    def _rid_unsafe(cls, df: DataFrame) -> bool:
        plan = df._jdf.queryExecution().executedPlan().toString().lower()
        for benign in ("broadcastexchange", "broadcastquerystage"):
            plan = plan.replace(benign, "")
        return any(m in plan for m in cls._ORDER_UNSTABLE_MARKERS)

    def _pin_batch(self, batch: DataFrame) -> DataFrame:
        """Make the batch's row order stable across the merge's multiple
        actions. Deterministic scan subtrees (file scan → narrow ops — the
        batch-replay path) pass through untouched, keeping column pruning;
        anything carrying a shuffle/state op (the streaming path) is pinned
        via lazy localCheckpoint — materialized once on the merge's first
        action, reused by every later pass."""
        if not self._rid_unsafe(batch):
            return batch
        return batch.localCheckpoint(eager=False)

    def _write_bucketed(
        self, df: DataFrame, abs_dir: str, n_buckets: int,
        approx_rows: int | None = None, prepartitioned: bool = False,
    ) -> None:
        """Write merged rows of the affected buckets, one dir per bucket.

        File-count control matters as much as parallelism: at 10^10 events a
        commit that fans every bucket into `salt × buckets` files drowns in
        metadata. Partitioning is sized from the expected row volume —
        roughly one task per ROWS_PER_FILE rows — and only salted beyond the
        bucket key when a single bucket would otherwise exceed one task's
        worth of data (B11: the hot mega-repo spreads over buckets already,
        since bucketing hashes (repo, path)).
        """
        # Rows here can carry multi-KB payloads, so size write parallelism by
        # row count aggressively (≈250k rows ≈ a few hundred MB compressed
        # per task): too few tasks leaves the disks idle (observed 38% CPU at
        # ~15 tasks on a 24 GB rewrite), too many sprays small files.
        cluster = self.cluster_within_buckets

        def _clustered(d: DataFrame) -> DataFrame:
            # in-task sort only (no exchange): clusters values so parquet
            # row-group min/max stats become selective for these columns.
            # A precomputed Morton key (compact(zorder_by=...)) takes
            # precedence and is dropped after ordering — the projection
            # preserves the in-partition sort, so the key never hits disk.
            if "_zkey" in d.columns:
                return d.sortWithinPartitions("_bucket_dir", "_zkey").drop("_zkey")
            if self.zorder_on_write:
                zk = self._write_time_zkey(d)
                if zk is not None:
                    return d.sortWithinPartitions("_bucket_dir", zk)
            if not cluster:
                return d
            return d.sortWithinPartitions("_bucket_dir", *cluster)

        bloom = self._bloom_options(approx_rows or 0, n_buckets)
        if prepartitioned:
            # the copart merge already repartitioned by (_bucket_dir[, salt])
            # — the join's exchange IS the write exchange; re-partitioning
            # here would both add a shuffle and break the co-partitioning
            _clustered(df).write.mode("overwrite").options(**bloom) \
                .partitionBy("_bucket_dir").parquet(abs_dir)
            return
        n_parts, salted = self._write_layout(approx_rows or 0)
        out = df.withColumn("_bucket_dir", bucket_of(n_buckets, self.bucket_keys))
        if salted:
            # large rewrite: salt within buckets so a handful of hot buckets
            # can't serialize the write (B11)
            salt = F.pmod(F.xxhash64(*[F.col(k) for k in self.keys]), F.lit(8))
            out = out.repartition(n_parts, F.col("_bucket_dir"), salt)
        else:
            out = out.repartition(n_parts, F.col("_bucket_dir"))
        _clustered(out).write.mode("overwrite").options(**bloom) \
            .partitionBy("_bucket_dir").parquet(abs_dir)

    def _bloom_options(self, approx_rows: int, n_buckets: int) -> dict[str, str]:
        """Parquet writer options enabling per-key-column bloom filters,
        sized by the expected distinct keys per bucket file (parquet-mr
        allocates from expected NDV at ~1% fpp; the unsized default burns
        ~0.7 MB/column/file). The READ side needs no knob — the parquet
        reader consults blooms for pushed-down equality predicates
        (parquet.filter.bloom.enabled defaults true), so ``lookup()``'s
        key filter skips row groups inside the routed bucket for free."""
        if not self.bloom_filter_keys:
            return {}
        ndv = max(1024, approx_rows // max(1, n_buckets))
        opts: dict[str, str] = {}
        for k in self.keys:
            opts[f"parquet.bloom.filter.enabled#{k}"] = "true"
            opts[f"parquet.bloom.filter.expected.ndv#{k}"] = str(ndv)
        return opts

    def _write_layout(self, approx_rows: int) -> tuple[int, bool]:
        """(n_partitions, salted) for a bucketed write of ~approx_rows."""
        ROWS_PER_TASK = 250_000
        max_parts = self.write_partitions or int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
        n_parts = max(4, min(max_parts, approx_rows // ROWS_PER_TASK + 4))
        return n_parts, n_parts >= max_parts

    def _list_bucket_dirs(self, abs_dir: str) -> set[int]:
        if not os.path.isdir(abs_dir):
            return set()
        return {
            int(name.split("=", 1)[1])
            for name in os.listdir(abs_dir)
            if name.startswith("_bucket_dir=")
        }

    def _footer_rows(self, abs_dir: str) -> dict[int, int]:
        """Exact per-bucket row counts of a freshly written version dir,
        from parquet footer metadata — driver-side only, one footer read
        per file, no data scan. Keeps manifest ``bucket_rows`` exact
        (the 'auto' write-mode policy reads them; an accumulate-only
        estimate once inflated a COW table's count 2x and flipped a
        steady-state workload to MOR on a false table-size signal)."""
        import pyarrow.parquet as pq

        out: dict[int, int] = {}
        if not os.path.isdir(abs_dir):
            return out
        for name in os.listdir(abs_dir):
            if not name.startswith("_bucket_dir="):
                continue
            bdir = os.path.join(abs_dir, name)
            n = 0
            for f in os.listdir(bdir):
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(bdir, f)).metadata.num_rows
            out[int(name.split("=", 1)[1])] = n
        return out

    def _write_lineage(
        self,
        man: dict,
        stats: list,
        job: str,
        batch_id: int,
        counts: LineageCounts,
        abs_dir: str,
    ) -> None:
        """One lineage row per affected bucket + one summary row
        (partition=-1) carrying the batch-level quarantine/late counts and
        input hash (descendant of ``pipeline/status.py::Status`` columns
        ``input_checksum`` / ``num_lines``).

        Written driver-side with pyarrow: lineage is O(n_buckets) metadata
        rows per commit — spinning a Spark job for it would add a fixed
        ~seconds of scheduling latency to every micro-batch.
        """
        import datetime as _dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        now = _dt.datetime.now(_dt.timezone.utc)
        rows = [
            {
                "job": job,
                "batch_id": batch_id,
                "partition": int(r["_bucket"]),
                "last_seq": int(r["max_seq"]),
                "rows_upserted": int(r["n"] - r["n_del"]),
                "rows_deleted": int(r["n_del"]),
                "rows_quarantined": 0,
                "rows_late": 0,
                "input_hash": str(r["h"]),
                "status": "success",
                "wall_ms": 0,
                "committed_ts": now,
            }
            for r in stats
        ]
        rows.append(
            {
                "job": job,
                "batch_id": batch_id,
                "partition": -1,
                # -1, not 0, when the batch carried no rows: lag_report's
                # "never applied" sentinel is -1, and a seq-0-only log must
                # not read as caught-up after an all-quarantined first batch
                "last_seq": int(max((r["max_seq"] for r in stats), default=-1)),
                "rows_upserted": int(sum(r["n"] - r["n_del"] for r in stats)),
                "rows_deleted": int(sum(r["n_del"] for r in stats)),
                "rows_quarantined": counts.rows_quarantined,
                "rows_late": counts.rows_late,
                "input_hash": counts.input_hash or str(sum(int(r["h"]) for r in stats)),
                "status": "success",
                "wall_ms": counts.wall_ms,
                "committed_ts": now,
            }
        )
        arrow_schema = pa.schema(
            [
                ("job", pa.string()),
                ("batch_id", pa.int64()),
                ("partition", pa.int32()),
                ("last_seq", pa.int64()),
                ("rows_upserted", pa.int64()),
                ("rows_deleted", pa.int64()),
                ("rows_quarantined", pa.int64()),
                ("rows_late", pa.int64()),
                ("input_hash", pa.string()),
                ("status", pa.string()),
                ("wall_ms", pa.int64()),
                ("committed_ts", pa.timestamp("us", tz="UTC")),
            ]
        )
        tbl = pa.Table.from_pylist(rows, schema=arrow_schema)
        os.makedirs(abs_dir, exist_ok=True)
        pq.write_table(tbl, os.path.join(abs_dir, "part-00000.parquet"))

    def _commit_empty(
        self,
        man: dict,
        job: str,
        batch_id: int,
        counts: LineageCounts,
        job_state: dict | None,
        properties: dict | None,
        staged: bool = False,
    ) -> MergeResult:
        """An empty (or fully-quarantined) batch still advances the guard —
        otherwise a restart would re-run it forever."""
        version = man["version"] + 1
        token = self._begin_attempt()
        lineage_rel = f"lineage/l{version}_w{token}"
        self._write_lineage(man, [], job, batch_id, counts, os.path.join(self.root, lineage_rel))
        man_new = dict(man)
        man_new["version"] = version
        man_new["committed"] = {**man["committed"], job: batch_id}
        if job_state is not None:
            man_new["state"] = {**man["state"], job: job_state}
        if properties is not None:
            man_new["properties"] = {**man["properties"], **properties}
        man_new["lineage"] = list(man["lineage"]) + [lineage_rel]
        self._stamp_published(man_new, man, staged)
        committed = self._swap_manifest(
            man_new,
            rebase=lambda cur: self._rebase_commit(
                man, man_new, cur, [], job, batch_id, staged
            ),
        )
        return MergeResult(
            applied=True, version=committed["version"],
            rebased=committed is not man_new,
        )

    # ---- maintenance ----------------------------------------------------------

    def _live_dirs(self, man: dict, retain: int | None = None) -> tuple[set, set]:
        """Data/lineage dir names referenced by the manifest, the last
        ``retain`` history snapshots, tags, and the published/staged chain."""
        retain = self.retain_history if retain is None else retain
        manifests = [man]
        # tagged versions are pinned outside the rolling window
        window = set(range(max(0, man["version"] - retain), man["version"]))
        window |= {int(v) for v in man.get("refs", {}).values()}
        if man.get("published_version") is not None:
            window.add(int(man["published_version"]))
        window.discard(man["version"])
        for v in sorted(window):
            hpath = os.path.join(self.root, "history", f"manifest.v{v}.json")
            try:
                with open(hpath, "r", encoding="utf-8") as fh:
                    manifests.append(json.load(fh))
            except (OSError, ValueError):
                continue
        live_data = {
            rel.split("/")[1]
            for m in manifests
            for b in m["buckets"]
            for rel in self._dirs_of(m, b)
        }  # v{N} / v{N}_compact
        live_lineage = {
            rel.split("/")[1] for m in manifests for rel in m["lineage"]
        }
        return live_data, live_lineage

    def vacuum(self, grace_seconds: int = 3600) -> dict:
        """Remove ORPHANED data/lineage dirs on demand — the Iceberg
        ``remove_orphan_files`` analog (plans/iceberg.py has the procedure
        twin). Orphans exist when a writer crashed between the bucketed
        write and the manifest swap: the dir is on disk, no manifest ever
        references it. ``_gc_orphans`` already sweeps PAST-versioned
        leftovers inside every commit, but (a) a quiet table never commits
        again, and (b) a crashed attempt at version N+1 stays invisible to
        it until the version counter passes N+1. ``vacuum`` closes both:
        any unreferenced dir goes, REGARDLESS of its version, provided its
        mtime is older than ``grace_seconds`` — the grace window protects a
        CONCURRENT writer's freshly written dir whose commit hasn't swapped
        yet (the same reason Iceberg's procedure defaults older_than to
        3 days). Metadata-only driver-side listing; no Spark job."""
        man = self._require_manifest()
        live_data, live_lineage = self._live_dirs(man)
        inflight = self._inflight_tokens()
        now = time.time()
        removed: list[str] = []
        kept_grace: list[str] = []
        for sub, live in (("data", live_data), ("lineage", live_lineage)):
            root = os.path.join(self.root, sub)
            if not os.path.isdir(root):
                continue
            for name in os.listdir(root):
                if name in live or name.startswith("."):
                    continue
                if self._attempt_token_of(name) in inflight:
                    kept_grace.append(f"{sub}/{name}")  # writer mid-commit
                    continue
                path = os.path.join(root, name)
                try:
                    age = now - os.path.getmtime(path)
                except OSError:
                    continue
                if age < grace_seconds:
                    kept_grace.append(f"{sub}/{name}")
                    continue
                shutil.rmtree(path, ignore_errors=True)
                removed.append(f"{sub}/{name}")
        return {"removed": sorted(removed), "kept_grace": sorted(kept_grace)}

    def _gc_orphans(self, man: dict, retain: int | None = None) -> None:
        """Drop data/lineage dirs not referenced by the committed manifest —
        leftovers of crashed attempts — nor by any of the last ``retain``
        version snapshots (default ``retain_history``; time-travel
        retention). Best-effort; never fails a commit."""
        live_data, live_lineage = self._live_dirs(man, retain)
        # a CONCURRENT writer's attempt dirs embed base+1 ≤ our committed
        # version, so the version test alone would sweep a write in flight —
        # its .inflight marker (begin_attempt) exempts it until stale
        inflight = self._inflight_tokens()
        try:
            data_root = os.path.join(self.root, "data")
            if os.path.isdir(data_root):
                for name in os.listdir(data_root):
                    if (name not in live_data and not name.startswith(".")
                            and self._attempt_token_of(name) not in inflight
                            and self._version_of(name) < man["version"]):
                        shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)
            lin_root = os.path.join(self.root, "lineage")
            if os.path.isdir(lin_root):
                for name in os.listdir(lin_root):
                    if (name not in live_lineage and not name.startswith(".")
                            and self._attempt_token_of(name) not in inflight
                            and self._version_of(name, "l") < man["version"]):
                        shutil.rmtree(os.path.join(lin_root, name), ignore_errors=True)
        except OSError:
            pass

    @staticmethod
    def _version_of(dirname: str, prefix: str = "v") -> int:
        try:
            return int(dirname.lstrip(prefix).split("_")[0])
        except ValueError:
            return 1 << 62

    def compact(
        self,
        *,
        drop_tombstones_below_seq: int | None = None,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Full rewrite: fold every bucket's delta chain into one base dir,
        coalesce small files, and GC tombstones whose sequence is below the
        given bound (i.e. no redelivery can still reference them). Returns
        the new version. Resets the bucket_rows estimates to exact counts.

        ``zorder_by`` lays the rewrite out along the Morton curve of the
        given columns (Delta ``OPTIMIZE ZORDER BY`` analog;
        functions/zorder.py): within each bucket every listed column's
        value range is bounded per row group, so selective scans on ANY of
        them skip row groups — the multi-column complement to the
        lexicographic ``cluster_within_buckets`` per-merge knob. Purely a
        physical layout: the committed state is identical.

        The columns PERSIST as the ``zorder_by`` table property in the same
        commit, and later ``compact()``/``rebucket()`` calls (including
        scheduled ``optimize()``) default to them — an auto-maintenance
        rewrite must not silently destroy the layout a nightly OPTIMIZE
        established. Pass ``zorder_by=[]`` to clear the property and
        rewrite unclustered."""
        man = self._require_manifest()
        df = self._resolved(man)
        if drop_tombstones_below_seq is not None:
            df = df.where(~((F.col("_op") == "D") & (F.col("_seq") < drop_tombstones_below_seq)))
        if zorder_by is not None:
            cols = list(zorder_by)
        else:
            cols = list(man.get("properties", {}).get("zorder_by") or [])
        props_update = None
        if cols:
            df, stats = self._with_zorder(df, cols)
            # persist the FRESH bounds with the layout: merge-time curve
            # maintenance (zorder_on_write) keys off these literals, and
            # every z-ordered rewrite re-fits them to the current data
            props_update = {
                "zorder_by": cols,
                "zorder_stats": {c: list(stats[c]) for c in cols},
            }
        elif zorder_by is not None:  # explicit [] — clear the layout
            props_update = {"zorder_by": [], "zorder_stats": {}}
        return self._rewrite_all(
            man, df, man["n_buckets"], props_update=props_update
        )

    def _write_time_zkey(self, d: DataFrame):
        """Morton key for an ordinary merge write, from the PERSISTED
        layout + bounds (zorder_on_write): manifest literals only — no
        stats scan on the hot path. None when the table has no fitted
        layout or the rows lack a layout column (pre-evolution batch)."""
        props = (self._read_manifest() or {}).get("properties", {})
        cols = props.get("zorder_by") or []
        stats_p = props.get("zorder_stats") or {}
        if not cols or any(c not in d.columns or c not in stats_p for c in cols):
            return None
        from wprdc_etl_spark.functions.zorder import zorder_key

        stats = {c: (float(stats_p[c][0]), float(stats_p[c][1])) for c in cols}
        return zorder_key(d, cols, stats)

    def _with_zorder(self, df: DataFrame, cols: list[str]):
        from wprdc_etl_spark.functions.zorder import zorder_key, zorder_stats

        missing = [c for c in cols if c not in df.columns]
        if missing:
            raise ValueError(f"zorder columns not in the data: {missing}")
        # stats over the COLUMN-PRUNED chain: the resolve re-runs for this
        # pass, but its parquet scans read only the z columns (+ the narrow
        # LWW metadata) — far cheaper at scale than caching the payload-wide
        # chain to save the second pass (r3 code review weighed both)
        stats = zorder_stats(df.select(*cols), cols)
        return df.withColumn("_zkey", zorder_key(df, cols, stats)), stats

    def rebucket(self, new_n_buckets: int) -> int:
        """Bucket-layout evolution (Iceberg partition-evolution analog):
        rewrite the whole table under a new bucket count in ONE atomic
        commit. A table's bucket count must grow with it — at 10^10 rows the
        initial layout's per-bucket volume would dwarf a task — and because
        readers/writers always take ``n_buckets`` from the manifest, the
        switch is transparent: the next merge buckets by the new count, old
        versions time-travel under their own old layout (each history
        manifest carries its own n_buckets). Deltas fold in on the way
        (a rebucket is also a compaction)."""
        if new_n_buckets < 1:
            raise SinkCommitError(f"n_buckets must be >= 1, got {new_n_buckets}")
        man = self._require_manifest()
        df = self._resolved(man)
        zcols = man.get("properties", {}).get("zorder_by") or None
        props_update = None
        if zcols:  # a rebucket is also a compaction: keep the z-layout
            df, stats = self._with_zorder(df, list(zcols))
            props_update = {
                "zorder_stats": {c: list(stats[c]) for c in zcols}
            }
        version = self._rewrite_all(man, df, new_n_buckets, props_update=props_update)
        self.n_buckets = new_n_buckets
        return version

    def _rewrite_all(
        self, man: dict, df: DataFrame, n_buckets: int,
        props_update: dict | None = None,
    ) -> int:
        """Shared tail of compact()/rebucket(): write ``df`` fully bucketed
        by ``n_buckets`` and commit it as the table's only data. Full-table
        rewrites never rebase (they touch every bucket by definition), but
        their attempt dirs are token-unique all the same — two concurrent
        full rewrites must not clobber each other's files — and the marker
        shields the write from a concurrent committer's orphan GC."""
        version = man["version"] + 1
        token = self._begin_attempt()
        try:
            return self._rewrite_all_inner(
                man, df, n_buckets, version, token, props_update=props_update
            )
        finally:
            self._end_attempt()

    def _rewrite_all_inner(
        self, man: dict, df: DataFrame, n_buckets: int, version: int, token: str,
        props_update: dict | None = None,
    ) -> int:
        data_rel = f"data/v{version}_w{token}"
        df = df.persist()
        per_bucket = df.groupBy(
            bucket_of(n_buckets, man.get("bucket_keys", self.bucket_keys)).alias("_b")
        ).agg(
            F.count("*").alias("n"),
            # full rescan anyway → refresh the zones to EXACT bounds here,
            # shedding the conservative widening merge-time zones accrue
            F.min("_seq").alias("min_seq"),
            F.max("_seq").alias("max_seq"),
        ).collect()
        counts_by_bucket = {int(r["_b"]): int(r["n"]) for r in per_bucket}
        zones_by_bucket = {int(r["_b"]): [int(r["min_seq"]), int(r["max_seq"])] for r in per_bucket}
        self._write_bucketed(
            df, os.path.join(self.root, data_rel), n_buckets, sum(counts_by_bucket.values())
        )
        df.unpersist()
        written = self._list_bucket_dirs(os.path.join(self.root, data_rel))
        man_new = dict(man)
        man_new["version"] = version
        man_new["n_buckets"] = n_buckets
        man_new["buckets"] = {str(b): [f"{data_rel}/_bucket_dir={b}"] for b in sorted(written)}
        man_new["bucket_rows"] = {str(b): counts_by_bucket.get(b, 0) for b in sorted(written)}
        man_new["bucket_zones"] = {str(b): zones_by_bucket[b] for b in sorted(written) if b in zones_by_bucket}
        if props_update:
            man_new["properties"] = {**man.get("properties", {}), **props_update}
        self._stamp_published(man_new, man)
        self._swap_manifest(man_new)
        self._gc_orphans(man_new)
        return version
