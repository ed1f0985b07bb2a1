"""Partial-image (column-patch) CDC merge — normalize patches to full images.

Real CDC feeds routinely carry *partial* update images: Debezium with
``column.include.list`` filters, Maxwell/Canal updates that serialize only
changed columns, or application outboxes that PATCH a field. The reference's
loader has no analog (``pipeline/loaders.py::CKANDatastoreLoader`` upserts
whole records), so this is engine-native semantics, defined precisely:

- ``op='U'`` with a NULL in a *patch column* means **unchanged** — the value
  carries forward from the key's latest earlier image (earlier rows in the
  same batch first, else the table's current live row).
- ``op='I'`` is a full image: its NULLs are real NULLs (an insert resets the
  patch base — nothing leaks across a re-insert).
- ``op='D'`` resets the patch base to the **all-null image**: a patch applied
  after a delete resurrects the key with only the patched columns set.
  (Equivalently: D is a "setter" of NULL for every patch column.)

``normalize_patches`` rewrites every batch row into a FULL image under those
rules, so the ordinary sequence-LWW merge (exactly-once guard, bucket
pruning, MOR/COW, time travel — all of plans/lake.py) applies unchanged: the
LWW winner of normalized rows is by construction the cumulative image.
Normalize-then-merge is therefore **batch-split invariant**: any chunking of
an in-key-order log converges to the same final state as a single global
carry-forward replay (each normalized image equals the global cumulative
image by induction over batches — the baseline live row *is* the cumulative
image of all prior batches).

Requires per-key in-sequence delivery of U-patches across batches (the
binlog guarantee; a late full image is still safely discarded by LWW, but a
late *partial* image would have been normalized against a too-new base).

Scale design (the 10^10-event shape):

- the carry-forward window runs on NARROW metadata only (keys, _seq, flags,
  a synthetic row id); payload values never ride the sort — each patch
  column's value is late-materialized by ONE equi-join on the 8-byte rid,
  the same idiom as the merge itself (plans/lake.py late materialization).
- the table baseline is pruned to the batch's affected buckets driver-side
  (``read_pruned``) and then key-semi-joined, so a trickle batch against a
  huge table reads only the touched buckets' live rows.
- the union is pinned once (``localCheckpoint``, the merge's ``_pin_batch``
  discipline) because the window pass and k value passes must agree on row
  ids across actions; the materialized footprint is O(|batch| + |live rows
  of the batch's keys|), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError

ENVELOPE_COLS = ("op", "event_sequence", "event_ts")


def _baseline_for(table, batch: DataFrame) -> DataFrame | None:
    """Current live rows for the batch's keys — bucket-pruned when the sink
    supports it (the incremental-probe pattern of functions/neardup_index)."""
    if not table.exists():
        return None
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

    if isinstance(table, ParquetSnapshotTable):
        if not table._require_manifest()["buckets"]:
            return None
        base = table.read_pruned_for_keys(batch)
    else:
        base = table.read()
    return base.join(batch.select(*table.keys).distinct(), list(table.keys), "left_semi")


def normalize_patches(
    table,
    batch: DataFrame,
    patch_cols: list[str] | tuple[str, ...] | None = None,
    *,
    use_baseline: bool = True,
    emit_absolute: bool = False,
) -> DataFrame:
    """Rewrite partial-update events into full images (see module doc).

    ``batch`` carries the table keys, ``op``, ``event_sequence`` (and
    optionally ``event_ts``) plus payload columns. ``patch_cols`` defaults to
    every non-key payload column; columns outside it are taken from the event
    verbatim (full-image semantics). Returns a DataFrame with the batch's
    exact column set, ready for ``table.merge`` / the ingest pipeline.
    Table-only columns absent from the batch keep ordinary merge semantics
    (nulled on winning rewrites) — declare them in the batch to patch them.

    ``use_baseline=False`` runs BATCH-LOCAL normalization only: no read of
    the table's live rows; a U whose chain never sets a column leaves it
    NULL, to be resolved against the target at merge time (the Iceberg
    ``patch_merge_sql`` COALESCE path, where the target row IS the baseline
    and a second read would be redundant work *and* a race under concurrent
    writers). ``emit_absolute=True`` appends a boolean ``_abs`` column:
    True when the row's in-batch chain contains an I or D at/before it, so
    its image is ABSOLUTE (authoritative over the target — the sink must
    not coalesce; an in-batch delete-reset would otherwise resurrect target
    values the delete wiped).
    """
    keys = list(table.keys)
    env = [c for c in ENVELOPE_COLS if c in batch.columns]
    if "op" not in env or "event_sequence" not in env:
        raise SinkCommitError("patch batch needs 'op' and 'event_sequence' columns")
    payload = [c for c in batch.columns if c not in ENVELOPE_COLS]
    for k in keys:
        if k not in payload:
            raise SinkCommitError(f"patch batch missing key column {k!r}")
    nonkey = [c for c in payload if c not in keys]
    pcols = list(patch_cols) if patch_cols is not None else list(nonkey)
    bad = [c for c in pcols if c not in nonkey]
    if bad:
        raise SinkCommitError(f"patch_cols {bad} are not non-key batch payload columns")
    clash = [c for c in batch.columns if c.startswith("_")]
    if clash:
        raise SinkCommitError(f"batch columns may not start with '_': {clash}")

    # --- align batch and baseline to one shape ------------------------------
    # D resets the patch base: null every non-key payload value on tombstones
    # so D "sets NULL" for every column (module-doc rule 3).
    bsrc = batch.select(
        *keys,
        *[
            F.when(F.col("op") == "D", F.lit(None).cast(batch.schema[c].dataType))
            .otherwise(F.col(c))
            .alias(c)
            for c in nonkey
        ],
        F.col("op").alias("_op"),
        F.col("event_sequence").cast("long").alias("_seq"),
        (F.col("event_ts") if "event_ts" in env else F.lit(None).cast("timestamp")).alias("_ts"),
        F.lit(1).alias("_src"),
    )
    base = _baseline_for(table, batch) if use_baseline else None
    if base is not None:
        wide = base.select(
            *keys,
            *[
                (F.col(c).cast(batch.schema[c].dataType) if c in base.columns
                 else F.lit(None).cast(batch.schema[c].dataType)).alias(c)
                for c in nonkey
            ],
            F.lit("I").alias("_op"),
            F.lit(-1).cast("long").alias("_seq"),
            F.lit(None).cast("timestamp").alias("_ts"),
            F.lit(0).alias("_src"),
        ).unionByName(bsrc)
    else:
        wide = bsrc
    # One rid assignment shared by the window pass and every value pass:
    # baseline resolution shuffles (LWW inside read_pruned), so rids are only
    # stable if the frame is pinned (plans/lake.py::_pin_batch rationale).
    wide = wide.withColumn("_rid", F.monotonically_increasing_id()).localCheckpoint(
        eager=False
    )

    # --- carry-forward on narrow metadata -----------------------------------
    # Setter rule per column c: I and D always set (their value, D's = NULL);
    # U sets iff non-null. The latest setter's rid at each row is a running
    # last(...ignorenulls) over (key) ordered by (_src, _seq, _rid) — baseline
    # first, then sequence order; rid breaks redelivery ties deterministically.
    w = (
        Window.partitionBy(*keys)
        .orderBy("_src", "_seq", "_rid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    meta = wide.select(
        *keys,
        "_op",
        "_seq",
        "_ts",
        "_src",
        "_rid",
        *[
            ((F.col("_op") != "U") | F.col(c).isNotNull()).alias(f"_set_{c}")
            for c in pcols
        ],
    )
    abs_cols = (
        [
            F.last(F.when(F.col("_op") != "U", F.col("_rid")), ignorenulls=True)
            .over(w)
            .isNotNull()
            .alias("_abs")
        ]
        if emit_absolute
        else []
    )
    carried = meta.select(
        *keys,
        "_op",
        "_seq",
        "_ts",
        "_src",
        "_rid",
        *abs_cols,
        *[
            F.last(F.when(F.col(f"_set_{c}"), F.col("_rid")), ignorenulls=True)
            .over(w)
            .alias(f"_from_{c}")
            for c in pcols
        ],
    ).where(F.col("_src") == 1)

    # --- late-materialize values by rid --------------------------------------
    out = carried
    own = [c for c in nonkey if c not in pcols]
    if own:
        vals = wide.select(F.col("_rid").alias("_vr"), *own)
        out = out.join(vals, out["_rid"] == vals["_vr"], "left").drop("_vr")
    for c in pcols:
        vals = wide.select(F.col("_rid").alias("_vr"), F.col(c).alias(f"_val_{c}"))
        out = (
            out.join(vals, out[f"_from_{c}"] == vals["_vr"], "left")
            .drop("_vr", f"_from_{c}")
            .withColumnRenamed(f"_val_{c}", c)
        )

    sel = []
    for c in batch.columns:
        if c == "op":
            sel.append(F.col("_op").alias("op"))
        elif c == "event_sequence":
            sel.append(F.col("_seq").alias("event_sequence"))
        elif c == "event_ts":
            sel.append(F.col("_ts").alias("event_ts"))
        else:
            sel.append(F.col(c))
    if emit_absolute:
        sel.append(F.col("_abs"))
    return out.select(*sel)


def patch_merge(
    table,
    batch: DataFrame,
    *,
    job: str = "patch",
    batch_id: int = 0,
    patch_cols: list[str] | tuple[str, ...] | None = None,
    **merge_kwargs,
):
    """normalize_patches ∘ merge — one partial-image batch, exactly once."""
    if not table.exists():
        from pyspark.sql import types as T

        table.ensure(
            T.StructType([f for f in batch.schema.fields if f.name not in ENVELOPE_COLS])
        )
    return table.merge(
        normalize_patches(table, batch, patch_cols),
        job=job,
        batch_id=batch_id,
        **merge_kwargs,
    )
