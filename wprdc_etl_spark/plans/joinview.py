"""JoinView — an incrementally-maintained materialized JOIN view
(fact LEFT JOIN dim), refreshed from BOTH tables' changelogs.

Reference tie-in: wprdc-etl pipelines load one flat resource per job
(pipeline/loaders.py upsert path) and leave enrichment joins to the
consumer's warehouse — every dashboard re-joins the full table. At lake
scale the missing verb is incremental view maintenance (IVM): keep
``fact ⟕ dim`` materialized and fold in only what changed. This follower
completes the engine's MV family — RollupView maintains *aggregates*,
TableReplicator maintains an *identity* copy, JoinView maintains a *join*
— using the classical delta algebra for a key-equality left join where the
dim side is unique per join key (it IS the dim table's merge key):

    Δ(F ⟕ D) =  (ΔF ⟕ D_new)                      -- fact-side deltas
             ∪  ((F_new ⋉ keys(ΔD)) ⟕ D_new)       -- dim-side fan-out
             ∪  deletes(ΔF)                        -- fact deletes drop rows

Both unions re-emit the affected FACT keys against the (F_new, D_new)
snapshot pair, so overlapping fact/dim changes resolve to the same final
row and each key appears at most once per sync — no intra-batch LWW
ambiguity. Dim inserts flip previously-NULL dim columns, dim deletes flip
them back to NULL (left-join semantics), dim updates rewrite every
referencing row: all three arrive as ordinary dim changelog entries.

Engine contracts reused wholesale (same shape as TableReplicator /
KmvRollup):

- storage is an ordinary engine table keyed and bucketed by the FACT keys
  — time travel / changelog / maintenance / CAS commit inherited;
- the cursor is the pair ``(fact_version, dim_version)`` persisted as the
  view table's own ``job_state`` INSIDE the same atomic commit that
  applies the delta (exactly-once: a crash-replayed sync re-reads the
  committed cursor and noops or recomputes the identical delta);
- payload late-materialization: changelogs are diffed on narrow
  fingerprint columns; full-width rows are fetched with ONE keyed join
  against the snapshot pair;
- a cursor expired under either source's retention falls back to a
  state-diff repair (``diff_states`` of the stored view vs the freshly
  joined pair) — O(|F| + |view|) for that one sync, still exact, and it
  also heals any divergence;
- rides ``IngestJob.follow(view)`` — synced after every committed
  (micro-)batch like any changelog follower.

Scale shape: an incremental sync shuffles O(|ΔF| + |ΔD| + |affected|)
narrow rows, plus ONE keyed join to late-materialize affected payloads
and ONE fact-side semi-join for the dim fan-out (broadcast of the changed
dim keys — dim deltas are dimension-sized). The dim fan-out is the one
inherently expensive leg of join IVM: a changed dim key touches every
referencing fact row; the semi-join prunes the rewrite to exactly those.
Nothing funnels through the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exceptions import SinkCommitError
from .lake import LineageCounts, ParquetSnapshotTable, diff_states, load_manifest_keys


class JoinView:
    """Materialize ``fact LEFT JOIN dim ON <on>`` into an engine table at
    ``root``, keyed by the fact table's merge keys.

    ``on`` maps fact column → dim column; its values must be exactly the
    dim table's merge keys, so every fact row joins at most one dim row
    (the cardinality that makes the delta algebra exact). ``dim_cols``
    selects which dim payload columns the view carries (default: all
    non-key dim columns); names must not collide with fact columns.

    ``fact_compare_cols`` / ``dim_compare_cols`` forward to each side's
    ``changes_between`` — the usual narrow-fingerprint contract: a payload
    change invisible to the compare columns is not detected as 'U'.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fact: ParquetSnapshotTable,
        dim: ParquetSnapshotTable,
        *,
        on: dict[str, str],
        dim_cols: list[str] | None = None,
        job: str = "joinview",
        n_buckets: int = 8,
        retain_history: int = 1,
        fact_compare_cols: list[str] | None = None,
        dim_compare_cols: list[str] | None = None,
    ) -> None:
        # Restore both sides' authoritative keys from their manifests BEFORE
        # using them (see load_manifest_keys): without this, a CLI handle
        # opened without explicit keys would create the view table keyed by
        # the engine defaults while sync() later merges batches keyed by the
        # true fact keys.
        load_manifest_keys(fact, dim)
        if sorted(on.values()) != sorted(dim.keys):
            raise SinkCommitError(
                f"join columns {sorted(on.values())} must be exactly the dim "
                f"table's merge keys {sorted(dim.keys)} — a non-key dim join "
                f"can match many dim rows and the delta algebra stops being "
                f"exact"
            )
        # fact-side join columns may be fact keys (immutable grouping) or
        # payload columns (mutable: an update that moves a row to another
        # dim key re-emits it via the fact-side delta — still exact)
        self.spark = spark
        self.fact = fact
        self.dim = dim
        self.on = dict(on)
        self.dim_cols = list(dim_cols) if dim_cols is not None else None
        self.job = job
        self.fact_compare_cols = fact_compare_cols
        self.dim_compare_cols = dim_compare_cols
        self.table = ParquetSnapshotTable(
            spark,
            root,
            keys=list(fact.keys),
            bucket_keys=list(fact.keys),
            n_buckets=n_buckets,
            retain_history=retain_history,
        )

    # ---- internals ----------------------------------------------------------

    def _dim_payload_cols(self, d_state: DataFrame) -> list[str]:
        cols = (
            self.dim_cols
            if self.dim_cols is not None
            else [c for c in d_state.columns if c not in self.dim.keys]
        )
        missing = [c for c in cols if c not in d_state.columns]
        if missing:
            raise SinkCommitError(f"dim table has no column(s) {missing}")
        return cols

    def _full_join(self, f_state: DataFrame, d_state: DataFrame) -> DataFrame:
        """``F_new ⟕ D_new`` projected to (fact columns + dim payload
        columns). Dim-side join keys are renamed to throwaway names so the
        output carries the FACT-side join columns only."""
        dcols = self._dim_payload_cols(d_state)
        clash = [c for c in dcols if c in f_state.columns]
        if clash:
            raise SinkCommitError(
                f"dim column(s) {clash} collide with fact columns — project "
                f"the dim side (dim_cols=) or rename before joining"
            )
        d = d_state.select(
            *[F.col(dk).alias(f"_jv_{dk}") for dk in self.dim.keys], *dcols
        )
        cond = None
        for fc, dk in self.on.items():
            c = f_state[fc] == d[f"_jv_{dk}"]
            cond = c if cond is None else (cond & c)
        return f_state.join(d, cond, "left").select(*f_state.columns, *dcols)

    def _materialize(
        self,
        joined: DataFrame,
        affected_keys: DataFrame,
        delete_keys: DataFrame,
    ) -> DataFrame:
        """(affected, deleted) fact-key sets → one merge batch: affected
        rows re-emitted full-width from the joined snapshot pair as 'U',
        deletes as null-padded 'D' tombstones."""
        keys = self.fact.keys
        ups = joined.join(affected_keys.hint("SHUFFLE_HASH"), keys).select(
            *joined.columns, F.lit("U").alias("op")
        )
        payload = [c for c in joined.columns if c not in keys]
        dels = delete_keys.select(
            *keys,
            *[
                F.lit(None).cast(joined.schema[c].dataType).alias(c)
                for c in payload
            ],
            F.lit("D").alias("op"),
        )
        return ups.unionByName(dels)

    # ---- API ----------------------------------------------------------------

    def cursor(self) -> tuple[int, int] | None:
        """(fact_version, dim_version) the stored view reflects, from the
        view table's own committed job state (None before the first sync)."""
        if not self.table.exists():
            return None
        st = self.table.job_state(self.job)
        if "fact_version" not in st:
            return None
        return int(st["fact_version"]), int(st["dim_version"])

    def read(self) -> DataFrame:
        return self.table.read()

    def sync(self, to_version: int | None = None) -> dict:
        """Advance the view to the sources' current published versions
        (``to_version`` caps the FACT side — the ``IngestJob.follow``
        contract). Returns ``{"mode": "noop"|"bootstrap"|"incremental"|
        "repair", ...}``."""
        fv = self.fact.published_version()
        dv = self.dim.published_version()
        if fv is None or dv is None:
            raise SinkCommitError("fact and dim tables must both be committed")
        if to_version is not None:
            fv = min(fv, int(to_version))
        cur = self.cursor()
        if cur is not None and cur == (fv, dv):
            return {"mode": "noop", "applied": False, "fact_version": fv,
                    "dim_version": dv}

        f_state = self.fact.read(version=fv)
        d_state = self.dim.read(version=dv)
        joined = self._full_join(f_state, d_state)
        keys = self.fact.keys

        changes = []
        if cur is None:
            mode = "bootstrap"
            batch = joined.withColumn("op", F.lit("I"))
        else:
            last_f, last_d = cur
            try:
                if last_f > fv or last_d > dv:
                    # a source moved backwards relative to the cursor (e.g.
                    # the handle was pointed at an older table) — state-diff
                    # repair is the only exact answer
                    raise SinkCommitError("cursor ahead of source")
                affected = self.spark.createDataFrame([], f_state.select(*keys).schema)
                deletes = affected
                if fv > last_f:
                    # default compare: the fact table's narrow fingerprint
                    # PLUS any mutable (non-key) fact-side join columns — a
                    # row moving to another dim key changes the joined image
                    # even when its own fingerprint is unchanged
                    fcc = self.fact_compare_cols
                    if fcc is None:
                        fcc = (
                            ["content_sha"]
                            if "content_sha" in f_state.columns
                            else [c for c in f_state.columns if c not in keys]
                        )
                        fcc += [
                            c for c in self.on
                            if c not in keys and c not in fcc
                        ]
                    fc = self.fact.changes_between(
                        last_f, fv, compare_cols=fcc
                    ).persist()
                    changes.append(fc)
                    affected = affected.unionByName(
                        fc.where(F.col("change_op") != "D").select(*keys)
                    )
                    deletes = deletes.unionByName(
                        fc.where(F.col("change_op") == "D").select(*keys)
                    )
                if dv > last_d:
                    dc = self.dim.changes_between(
                        last_d, dv, compare_cols=self.dim_compare_cols
                    ).persist()
                    changes.append(dc)
                    # every CURRENT fact row referencing a changed dim key
                    # re-emits (insert/update/delete all change the joined
                    # image); broadcast — dim deltas are dimension-sized
                    dkeys = dc.select(
                        *[F.col(dk).alias(f"_jv_{dk}") for dk in self.dim.keys]
                    ).distinct()
                    cond = None
                    for fc_col, dk in self.on.items():
                        c = f_state[fc_col] == dkeys[f"_jv_{dk}"]
                        cond = c if cond is None else (cond & c)
                    fanout = f_state.join(
                        F.broadcast(dkeys), cond, "left_semi"
                    ).select(*keys)
                    affected = affected.unionByName(fanout)
                # a key both re-emitted and deleted cannot happen: deletes
                # come only from fact-'D' rows, which are gone from f_state
                affected = affected.distinct()
                deletes = deletes.distinct()
                batch = self._materialize(joined, affected, deletes)
                mode = "incremental"
            except SinkCommitError:
                # cursor expired under a source's retention (or moved
                # backwards): diff the stored view against the fresh join —
                # exact at any lag, and heals divergence
                view_state = self.table.read()
                dcols = self._dim_payload_cols(d_state)
                if "content_sha" in view_state.columns and "content_sha" in joined.columns:
                    # narrow diff: fact fingerprint + fact-side join columns
                    # + dim attributes — payload bytes never ride the
                    # full-outer join
                    cmp_cols = ["content_sha"] + [
                        c for c in self.on if c not in keys and c != "content_sha"
                    ]
                    cmp_cols += [c for c in dcols if c not in cmp_cols]
                    cmp_cols = [c for c in cmp_cols if c in view_state.columns]
                else:
                    cmp_cols = [c for c in joined.columns if c not in keys
                                and c in view_state.columns]
                delta = diff_states(view_state, joined, keys, cmp_cols).persist()
                changes.append(delta)
                batch = self._materialize(
                    joined,
                    delta.where(F.col("change_op") != "D").select(*keys),
                    delta.where(F.col("change_op") == "D").select(*keys),
                )
                mode = "repair"

        last_bid = (
            self.table.last_committed_batch(self.job)
            if self.table.exists()
            else None
        )
        bid = 0 if last_bid is None else last_bid + 1
        try:
            self.table.ensure(batch.drop("op").schema)
            batch = batch.withColumn("event_sequence", F.lit(bid).cast("long"))
            res = self.table.merge(
                batch,
                job=self.job,
                batch_id=bid,
                job_state={"fact_version": fv, "dim_version": dv},
                counts=LineageCounts(
                    extra={"mode": mode, "fact_version": fv, "dim_version": dv}
                ),
            )
        finally:
            for df in changes:
                df.unpersist()
        return {
            "mode": mode,
            "applied": res.applied,
            "fact_version": fv,
            "dim_version": dv,
            "view_version": res.version,
            "rows_upserted": res.rows_upserted,
            "rows_deleted": res.rows_deleted,
        }
