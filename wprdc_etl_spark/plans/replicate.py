"""TableReplicator — incremental table→table replication over the changelog
(CDC out composed with CDC in).

Reference tie-in: wprdc-etl (pipeline/loaders.py upsert path) pushes each
pipeline's rows into one CKAN datastore and stops — downstream consumers
re-extract over HTTP. At lake scale the missing verb is replication: keep a
second table (another region, a dev copy, a differently-bucketed layout) in
sync without re-running ingest. This is the Iceberg "incremental append/CDC
read feeding a downstream MERGE" pattern, built entirely from contracts the
engine already has:

- **Cursor = the replica's own committed batch id.** ``sync()`` applies each
  delta via ``replica.merge(batch, job=..., batch_id=<source_version>)`` —
  the sink's duplicate-batch guard (B8) makes redelivery a no-op, and the
  cursor is durable inside the replica's manifest. No side files; a crash
  after commit but before the caller sees the result simply re-runs into a
  guard skip. Exactly-once per source version by construction.
- **Deltas come from the source changelog** (``changes_between(last, to)``),
  compared on a NARROW fingerprint column; full payloads for I/U rows are
  late-materialized with one keyed join against the target-version snapshot
  (the engine's late-materialization idiom — payload bytes never ride the
  full-outer diff). The join is shuffle-hash by hint; AQE converts it to a
  broadcast at runtime when the change set turns out small, so steady-state
  trickle syncs pay a broadcast, bulk catch-ups a hash join — no driver-side
  size probe, no extra action.
- **Retention-expired cursor → state-diff repair.** If the source GC'd the
  replica's last-seen version (``retain_history`` policy), ``sync()`` falls
  back to ``diff_states(replica_state, source_state)`` — the same
  full-outer-join shape, still a correct net I/U/D delta (it also repairs
  any divergence), just O(|source| + |replica|) instead of O(|changes|) for
  that one sync.
- **``verify()``** is B14 applied to both ends: order-insensitive state
  fingerprints over (keys + compared columns), evaluated at the replica's
  cursor version on the source side so an in-flight source commit never
  reads as divergence.

Ordering: every row of a sync carries ``event_sequence = <source version>``.
Within one sync each key appears at most once (the delta is NET), and later
syncs carry strictly larger versions, so the replica's LWW order is exactly
the source's version order.

Scale shape: an incremental sync shuffles O(|v_from| + |v_to|) narrow rows
(keys + fingerprint) for the diff plus one keyed join to fetch changed
payloads; the replica-side merge is the engine's normal MOR/COW path.
Nothing funnels through the driver. Additive schema evolution propagates
for free: new source columns appear in the materialized payload and the
replica's merge evolves its schema the same way ingest does (B9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import SinkCommitError
from ..operators.fingerprint import state_fingerprint
from .lake import LineageCounts, ParquetSnapshotTable, diff_states, load_manifest_keys


class TableReplicator:
    """Keep ``replica`` in sync with ``source``, one source version at a time.

    ``compare_cols`` drives change detection (default: ``content_sha`` when
    the source has it, else every common non-key column). Note the
    fingerprint contract: a payload change invisible to ``compare_cols``
    (e.g. comparing on ``content_sha`` when only ``lang`` changed) is not
    detected as 'U' — same documented semantics as ``changes_between``; pass
    explicit ``compare_cols`` when payloads can drift outside the
    fingerprint.
    """

    def __init__(
        self,
        source: ParquetSnapshotTable,
        replica: ParquetSnapshotTable,
        *,
        job: str = "replicate",
        compare_cols: list[str] | None = None,
    ) -> None:
        # restore both handles' authoritative keys before comparing them
        # (see lake.load_manifest_keys)
        load_manifest_keys(source, replica)
        if list(source.keys) != list(replica.keys):
            raise SinkCommitError(
                f"replica keys {replica.keys} must equal source keys "
                f"{source.keys} — replication is a keyed MERGE"
            )
        self.source = source
        self.replica = replica
        self.job = job
        self.compare_cols = list(compare_cols) if compare_cols else None

    # ---- internals ----------------------------------------------------------

    def _cmp_cols(self, state: DataFrame) -> list[str]:
        if self.compare_cols:
            return self.compare_cols
        payload = [c for c in state.columns if c not in self.source.keys]
        return ["content_sha"] if "content_sha" in payload else payload

    def _materialize(self, changes: DataFrame, target_state: DataFrame) -> DataFrame:
        """Narrow I/U/D delta → full-width merge batch: I/U payloads join
        back against the target snapshot by key (late materialization), D
        rows carry keys + null payload (the merge's tombstone contract)."""
        keys = self.source.keys
        payload = [c for c in target_state.columns if c not in keys]
        iu_keys = changes.where(F.col("change_op") != "D").select(*keys, "change_op")
        # shuffle-hash by hint; AQE downgrades to broadcast when the change
        # set is small — no driver-side count to pick a strategy
        iu = target_state.join(iu_keys.hint("SHUFFLE_HASH"), keys).select(
            *keys, *payload, F.col("change_op").alias("op")
        )
        d = changes.where(F.col("change_op") == "D").select(
            *keys,
            *[F.lit(None).cast(target_state.schema[c].dataType).alias(c) for c in payload],
            F.lit("D").alias("op"),
        )
        return iu.unionByName(d)

    # ---- API ----------------------------------------------------------------

    def cursor(self) -> int | None:
        """Last source version applied to the replica (None before the first
        sync) — read from the replica's own manifest, never a side file."""
        if not self.replica.exists():
            return None
        return self.replica.last_committed_batch(self.job)

    def sync(self, to_version: int | None = None) -> dict:
        """Advance the replica to ``to_version`` (default: the source's
        current version). Returns a report dict: ``mode`` is 'noop' |
        'bootstrap' | 'incremental' | 'repair', plus applied/version info."""
        # PUBLISHED version (WAP): never replicate an unaudited staged chain
        src_v = self.source.published_version()
        if src_v is None:
            raise SinkCommitError(
                f"source table at {self.source.root} does not exist"
            )
        to_v = src_v if to_version is None else to_version
        last = self.cursor()
        if last is not None and to_v <= last:
            return {"mode": "noop", "applied": False, "cursor": last, "to_version": to_v}

        target_state = self.source.read(version=to_v)
        changes = None
        if last is None:
            batch = target_state.withColumn("op", F.lit("I"))
            mode = "bootstrap"
        else:
            cmp_cols = self._cmp_cols(target_state)
            try:
                changes = self.source.changes_between(last, to_v, compare_cols=cmp_cols)
                mode = "incremental"
            except SinkCommitError:
                # cursor version expired under the source's retention policy:
                # diff the two live states instead — still a correct net delta.
                # Compare only columns BOTH sides have (the replica may lag an
                # additive evolution); rows whose only change is a brand-new
                # column still materialize it on any detected I/U.
                rep_state = self.replica.read()
                both = [c for c in cmp_cols if c in rep_state.columns]
                if not both:
                    both = [
                        c for c in target_state.columns
                        if c in rep_state.columns and c not in self.source.keys
                    ]
                changes = diff_states(rep_state, target_state, self.source.keys, both)
                mode = "repair"
            # the NARROW diff feeds the batch's I/U branch AND its D branch,
            # and every action the merge runs evaluates both — persist it so
            # the full-outer version join executes once per sync, not ~2×
            # per merge action
            changes = changes.persist()
            batch = self._materialize(changes, target_state)

        try:
            self.replica.ensure(batch.drop("op").schema)
            batch = batch.withColumn("event_sequence", F.lit(to_v).cast("long"))
            res = self.replica.merge(
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
            "replica_version": res.version,
            "rows_upserted": res.rows_upserted,
            "rows_deleted": res.rows_deleted,
        }

    def verify(self, cols: list[str] | None = None) -> dict:
        """B14 across tables: order-insensitive state fingerprints of the
        source (AT the replica's cursor version, so an in-flight source
        commit never reads as divergence) and the replica, over keys +
        ``cols`` (default: the compare columns). Two O(rows) scans, O(1)
        result each."""
        at = self.cursor()
        if at is None:
            raise SinkCommitError("replica has never been synced — nothing to verify")
        src = self.source.read(version=at)
        cols = list(self.source.keys) + (cols or self._cmp_cols(src))
        src_fp = state_fingerprint(src, cols)
        rep_fp = state_fingerprint(self.replica.read(), cols)
        return {"match": src_fp == rep_fp, "source_fp": src_fp,
                "replica_fp": rep_fp, "at_version": at}
