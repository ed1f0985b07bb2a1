"""A7/A1–A6 + B1/B2/B8/B12/B13 — the job orchestrator.

Parity: ``pipeline/pipeline.py::Pipeline`` — a builder
(``connect/extract/schema/load`` each storing a stage, ``run()`` executing
the linear flow with a completeness check, duplicate-input guard and status
logging, SURVEY §4.1). The engine version:

    IngestJob("repo_ingest")
        .source(log_dir)                      # A2/A3 → readStream/read parquet
        .schema(payload_schema)               # A4    → vectorized validation
        .sink(lake_table)                     # A5    → keyed MERGE
        .build()                              # A6    → IncompletePipelineError
    job.run_batch(...)        # batch replay (deterministic chunking)
    job.start_stream(ckpt)    # Structured Streaming + foreachBatch

Per micro-batch (``apply_batch``), the SURVEY §4.1 engine trace:
dedup (B3) → late split (B2 analog) → validate/quarantine (B5) →
content_sha (B6) → MERGE (B7) with lineage counts (B12), all committed
atomically with the (job, batch_id) exactly-once guard (B8).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import IncompletePipelineError, InvalidConfigException
from wprdc_etl_spark.operators.dedup import DEDUP_KEYS, dedup_events_streaming
from wprdc_etl_spark.operators.fingerprint import with_content_sha
from wprdc_etl_spark.plans.lake import LakeTable, LineageCounts
from wprdc_etl_spark.schema import BaseSchema, event_payload_schema
from wprdc_etl_spark.testgen import LANGS


def event_struct(extra_fields: list[T.StructField] | None = None) -> T.StructType:
    """The change-event envelope schema (FIXTURES.md §2). ``extra_fields``
    appends evolved payload columns (e.g. license:string)."""
    base = [
        T.StructField("event_sequence", T.LongType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
    return T.StructType(base + list(extra_fields or []))


class IngestJob:
    """Builder + runner for one CDC ingest pipeline."""

    def __init__(
        self,
        name: str,
        *,
        lateness: str | None = None,
        watermark_delay: str = "10 minutes",
        max_files_per_trigger: int = 8,
        compute_content_sha: bool = True,
        quarantine_dir: str | None = None,
        stream_dedup: str = "merge",
        staged: bool = False,
        patch: bool = False,
        patch_cols: list[str] | None = None,
        txn_gate: tuple[str, str] | None = None,
        txn_pending_dir: str | None = None,
    ) -> None:
        self.name = name
        self.lateness = lateness  # None → late events are applied, not dropped
        self.watermark_delay = watermark_delay
        self.max_files_per_trigger = max_files_per_trigger
        self.compute_content_sha = compute_content_sha
        # B3 placement for the stream path:
        # - 'merge' (default): NO in-graph stateful dedup. Exact redeliveries
        #   tie on the merge's (seq, op-rank) order key and collapse in its
        #   NARROW metadata LWW; cross-batch redeliveries re-apply as no-ops
        #   (LWW is idempotent). Payload bytes therefore never enter a
        #   state-store exchange, and the foreachBatch plan stays a
        #   deterministic file scan — the stream path becomes plan-identical
        #   to batch replay.
        # - 'state': dropDuplicatesWithinWatermark in the stream graph —
        #   watermark-bounded built-in state. Worth its full-row shuffle only
        #   when redelivery volume is so high that shedding duplicates
        #   *before* the merge pays for itself.
        if stream_dedup not in ("merge", "state"):
            raise IncompletePipelineError(f"unknown stream_dedup {stream_dedup!r}")
        self.stream_dedup = stream_dedup
        # WAP: commit every batch staged; an auditor publish()es the chain
        # (plans/lake.py write-audit-publish section). Parquet sink only.
        self.staged = staged
        # Partial-image CDC feed (operators/patch.py): normalize every
        # (micro-)batch's column patches into full images against the sink's
        # live rows BEFORE validation — a carried-forward image validates
        # like any full row, while a patch with no base keeps its NULLs and
        # quarantines under the ordinary rules. ``patch_cols`` narrows the
        # NULL-means-unchanged columns (default: every non-key payload
        # column). With a lateness rule, late rows are dropped downstream of
        # normalization: their values still seed later images in the same
        # batch (per-key in-order delivery is the patch contract anyway).
        self.patch = patch or patch_cols is not None
        self.patch_cols = list(patch_cols) if patch_cols is not None else None
        # B5: persist quarantined rows (with their per-field error report)
        # for inspection — the distributed descendant of marshmallow's
        # returned ``errors`` dict. None → count-only (lineage).
        self.quarantine_dir = quarantine_dir
        # Transaction-consistent apply (operators/txn.py): gate every
        # (micro-)batch to COMPLETE source transactions — txn_gate names the
        # (txn_id, txn_total) columns carried by the events; the incomplete
        # tail carries into the next batch. In-memory within a run;
        # ``txn_pending_dir`` persists the tail per batch id (_SUCCESS-marked
        # dir, last two batches retained — the foreachBatch replay window) so
        # a checkpoint restart resumes with the same pending set. Pending is
        # a pure function of the log prefix, so a replayed batch rewrites
        # identical content and the sink guard keeps the merge exactly-once.
        self.txn_gate = tuple(txn_gate) if txn_gate is not None else None
        self.txn_pending_dir = txn_pending_dir
        self._pending: DataFrame | None = None
        self._pending_bid: int = -1
        self._source_path: str | None = None
        self._source_format: str = "parquet"
        self.since_sequence: int | None = None
        self._envelope: str | None = None
        self._envelope_options: dict = {}
        self._event_schema: T.StructType = event_struct()
        self._payload_schema: BaseSchema | None = None
        self._sink: LakeTable | None = None
        self._rollups: list = []
        self._indexes: list = []
        self._built = False

    # ---- builder (A1–A5) --------------------------------------------------

    def source(
        self,
        path: str | list[str],
        fmt: str = "parquet",
        event_schema: T.StructType | None = None,
        envelope: str | None = None,
        envelope_options: dict | None = None,
        since_sequence: int | None = None,
    ) -> "IngestJob":
        """One log dir, or a LIST of dirs for a sharded change log (one
        binlog/WAL per source shard — the standard CDC deployment). Shards
        are unioned before the per-batch core; correctness of the union
        needs one of (both hold for real binlogs):

        - each key lives in exactly one shard (sharding by key), so LWW only
          ever compares sequences minted by the same shard; or
        - sequences are globally unique across shards (a log split by range).

        In batch mode the union is a multi-path scan (one job); in streaming
        each shard is its own file source (per-shard offset tracking in the
        one checkpoint) unioned into the same foreachBatch graph — a shard
        that stalls holds back only its own files, not the others' progress.

        ``envelope='debezium'|'maxwell'|'canal'`` reads the dirs as JSONL text files
        of connector change records instead of a parquet event log: each
        scan maps through sources/envelopes.py (one JVM-side from_json — the
        log-tailing-connector extract step) before the per-batch core, with
        ``envelope_options`` forwarded (e.g. ``seq_field='lsn'``,
        ``wrapper=True``). The envelope's row schema is this job's payload
        schema, so an evolved column must be declared there to be extracted.
        Malformed records and Kafka tombstones are dropped at decode
        (connector semantics); to count them into quarantine instead, parse
        with ``keep_invalid=True`` yourself and feed ``apply_batch``.

        ``since_sequence=S`` tails the log from AFTER position S (events with
        ``event_sequence > S``) — the handoff half of a snapshot bootstrap
        (``bootstrap_snapshot``). On a native parquet log the predicate lands
        directly above the scan and pushes down to the row-group stats; on an
        envelope feed it applies post-decode (a text scan has no sequence
        column to prune on).
        """
        self._source_path = path
        self.since_sequence = int(since_sequence) if since_sequence is not None else None
        if envelope is not None:
            if envelope not in ("debezium", "maxwell", "canal"):
                raise InvalidConfigException(f"unknown envelope {envelope!r}")
            fmt = "text" if fmt == "parquet" else fmt
        self._envelope = envelope
        self._envelope_options = dict(envelope_options or {})
        self._source_format = fmt
        if event_schema is not None:
            self._event_schema = event_schema
        return self

    def _scan_schema(self) -> T.StructType:
        """Scan schema: the native event envelope, or one raw JSON string
        column when an envelope adapter decodes downstream."""
        if self._envelope is None:
            return self._event_schema
        return T.StructType([T.StructField("value", T.StringType())])

    def _decode(self, df: DataFrame) -> DataFrame:
        """Envelope decode (no-op for native event logs) + handoff cut."""
        if self._envelope is not None:
            from wprdc_etl_spark.sources.envelopes import (
                parse_canal,
                parse_debezium,
                parse_maxwell,
            )

            assert self._payload_schema is not None
            row_schema = self._payload_schema.to_struct_type()
            fn = {"debezium": parse_debezium, "maxwell": parse_maxwell,
                  "canal": parse_canal}[self._envelope]
            df = fn(df, row_schema, **self._envelope_options)
        if self.since_sequence is not None:
            # snapshot handoff: the snapshot already reflects every event at
            # or before the watermark — pushed down on native parquet logs
            df = df.where(F.col("event_sequence") > F.lit(self.since_sequence))
        return df

    def schema(self, payload_schema: BaseSchema) -> "IngestJob":
        self._payload_schema = payload_schema
        return self

    def sink(self, table: LakeTable) -> "IngestJob":
        self._sink = table
        return self

    def rollup(self, view) -> "IngestJob":
        """Attach a continuous aggregate (plans/rollup.py::RollupView): after
        every committed (micro-)batch the view refreshes from the sink's
        changelog — O(|batch changes|), never a base-table rescan. refresh()
        is a version-checked no-op for skipped/replayed batches, so the
        stream's exactly-once story extends to the aggregate for free."""
        self._rollups.append(view)
        return self

    def search_index(self, idx) -> "IngestJob":
        """Attach a changelog-fed index (operators/codesearch.py::
        TrigramIndex): after every committed (micro-)batch the index syncs
        from the sink's changelog — postings recomputed only for the
        batch's changed keys, exactly-once per table version via the
        index's own guard (a skipped/replayed batch syncs to a no-op). The
        streaming analog of a Debezium→Elasticsearch connector pair, inside
        one exactly-once pipeline."""
        self._indexes.append(idx)
        return self

    def follow(self, consumer) -> "IngestJob":
        """Attach ANY changelog follower exposing ``sync()`` with its own
        exactly-once cursor (TrigramIndex, plans/scd2.py::Scd2Table, custom
        consumers with the same contract): synced after every committed
        (micro-)batch, alongside rollup views and search indexes."""
        self._indexes.append(consumer)
        return self

    def build(self) -> "IngestJob":
        """A6 — ``Pipeline.enforce_full_pipeline`` analog."""
        missing = [
            stage
            for stage, ok in [
                ("source", self._source_path is not None),
                ("schema", self._payload_schema is not None),
                ("sink", self._sink is not None),
            ]
            if not ok
        ]
        if missing:
            raise IncompletePipelineError(f"pipeline incomplete, missing stages: {missing}")
        if self.staged:
            # WAP forwards merge(staged=True); fail at build time, not with a
            # TypeError mid-batch, when the sink doesn't speak it (Iceberg's
            # WAP analog is spark.wap.id session config, a different protocol)
            import inspect

            if "staged" not in inspect.signature(self._sink.merge).parameters:
                raise IncompletePipelineError(
                    f"staged=True (write-audit-publish) is not supported by "
                    f"{type(self._sink).__name__}.merge — parquet-snapshot "
                    f"sink only"
                )
        self._built = True
        return self

    def _require_built(self) -> None:
        if not self._built:
            raise IncompletePipelineError("call .build() before running (stages unvalidated)")

    @classmethod
    def default_payload_schema(cls) -> BaseSchema:
        return event_payload_schema(list(LANGS))

    # ---- the per-batch core (§4.1 engine trace) ----------------------------

    def target_schema(self) -> T.StructType:
        assert self._payload_schema is not None
        s = self._payload_schema.to_struct_type()
        fields = list(s.fields)
        if self.compute_content_sha:
            fields.append(T.StructField("content_sha", T.StringType()))
        return T.StructType(fields)

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Process one (micro-)batch end to end. Safe to re-run with the same
        batch_id: the sink's guard makes it a no-op (B8).

        Job-count discipline (scale note): a micro-batch pays fixed
        scheduling latency per Spark action, so the whole accounting pass —
        row count, max event time, late count, quarantine count, input hash —
        is ONE aggregation over the validated batch; the only other actions
        are the merge's per-bucket stats and the write itself.
        """
        self._require_built()
        assert self._sink is not None and self._payload_schema is not None
        t0 = time.monotonic()
        sink = self._sink

        state: dict = {}
        if hasattr(sink, "job_state"):
            state = sink.job_state(self.name)

        pending_out: DataFrame | None = None
        if self.txn_gate is not None:
            from wprdc_etl_spark.operators.txn import gate_complete_txns

            txn_col, total_col = self.txn_gate
            prev = self._read_pending(
                batch_df.sparkSession, batch_id, schema=batch_df.schema
            )
            batch_df, pending_out = gate_complete_txns(
                batch_df, txn_col=txn_col, total_col=total_col, pending=prev
            )
            batch_df = batch_df.drop(txn_col, total_col)

        if self.patch:
            from wprdc_etl_spark.operators.patch import normalize_patches

            batch_df = normalize_patches(sink, batch_df, self.patch_cols)

        # validate (B5) → flag rows. Exact-redelivery dedup (B3) needs no
        # shuffle of its own here: in streaming it is the stateful
        # dropDuplicatesWithinWatermark upstream; in batch replay the merge's
        # metadata LWW subsumes it (identical rows tie on the order key and
        # exactly one materializes) — a separate dropDuplicates would shuffle
        # full payloads once more for nothing.
        applied = self._payload_schema.apply(batch_df)
        # late-event rule (B2 analog at the apply layer): relative to the
        # previous batch's high watermark — the same boundary semantics
        # Spark's own watermark has (advances at batch boundaries).
        late_flag = F.lit(False)
        if self.lateness is not None and state.get("max_event_ts") is not None:
            bound = F.to_timestamp(F.lit(state["max_event_ts"])) - F.expr(
                f"INTERVAL {self.lateness}"
            )
            late_flag = F.col("event_ts") < bound
        row_ok = (F.size(F.col("_errors")) == 0) & ~(
            (F.col("op") != "D") & F.col("content").isNull()
        )
        applied = applied.withColumn("_late", late_flag).withColumn("_valid", row_ok)
        # Accounting rides the merge's own first action via an Observation —
        # no extra scan, no cache of the raw batch.
        metric_exprs = lambda: [  # noqa: E731 — fresh Column objects per use
            F.count(F.lit(1)).alias("n"),
            F.max("event_ts").alias("max_ts"),
            F.coalesce(F.sum(F.when(F.col("_late"), 1).otherwise(0)), F.lit(0)).alias("n_late"),
            F.coalesce(
                F.sum(F.when(~F.col("_valid") & ~F.col("_late"), 1).otherwise(0)), F.lit(0)
            ).alias("n_quar"),
            F.coalesce(
                F.sum(F.xxhash64(*DEDUP_KEYS).cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("input_hash"),
        ]
        obs = Observation()
        applied = applied.observe(obs, *metric_exprs())
        valid = applied.where(F.col("_valid") & ~F.col("_late")).drop(
            "_errors", "_valid", "_late"
        )
        if self.compute_content_sha:
            valid = with_content_sha(valid)

        def finalize() -> tuple[LineageCounts, dict]:
            try:
                g = obs.get
            except Exception:
                # Spark 4.1 quirk: when every batch row is filtered away, the
                # AQE empty-relation rule can replace the subtree ABOVE the
                # CollectMetrics node with an empty LocalTableScan, erasing
                # the observation (Observation.get then fails converting the
                # schemaless placeholder row). Recompute the identical
                # metrics with a direct aggregate — one extra scan, paid only
                # on this rare all-rows-quarantined/late path.
                g = applied.agg(*metric_exprs()).collect()[0].asDict()
            counts = LineageCounts(
                rows_quarantined=int(g["n_quar"]),
                rows_late=int(g["n_late"]),
                input_hash=str(g["input_hash"]),
                wall_ms=int((time.monotonic() - t0) * 1000),
                extra={"n_raw": int(g["n"])},
            )
            new_state = dict(state)
            if g["max_ts"] is not None:
                prev = state.get("max_event_ts")
                cur = g["max_ts"].isoformat(sep=" ")
                new_state["max_event_ts"] = max(prev, cur) if prev else cur
            return counts, new_state

        merge_kw = {"staged": True} if self.staged else {}
        result = sink.merge(valid, job=self.name, batch_id=batch_id, finalize=finalize, **merge_kw)

        if self.quarantine_dir is not None and result.applied:
            # idempotent: one overwritten dir per batch — a replayed batch
            # (which the sink guard skips) never duplicates quarantine rows,
            # and a retried batch rewrites the same dir.
            bad = (
                applied.where(~F.col("_valid") & ~F.col("_late"))
                .withColumn(
                    "_errors",
                    F.when(
                        F.size(F.col("_errors")) == 0,
                        F.array(F.lit("content: required unless op='D'")),
                    ).otherwise(F.col("_errors")),
                )
                .withColumn("_errors", F.concat_ws("; ", F.col("_errors")))
                .drop("_valid", "_late")
            )
            bad.write.mode("overwrite").parquet(f"{self.quarantine_dir}/batch_id={batch_id}")

        if pending_out is not None:
            self._write_pending(pending_out, batch_id)

        for view in self._rollups:
            view.refresh()
        for ix in self._indexes:
            ix.sync()

    def _pending_dirs(self) -> list[tuple[int, str]]:
        import glob

        assert self.txn_pending_dir is not None
        out = []
        for d in glob.glob(os.path.join(self.txn_pending_dir, "b*")):
            if os.path.exists(os.path.join(d, "_SUCCESS")):
                try:
                    out.append((int(os.path.basename(d)[1:]), d))
                except ValueError:
                    continue
        return sorted(out)

    def _read_pending(
        self, spark: SparkSession, batch_id: int, *, schema=None
    ) -> DataFrame | None:
        """The pending tail as of BEFORE ``batch_id``: the in-memory carry
        when this process produced it, else the newest persisted dir with a
        smaller batch id (checkpoint-restart path). ``schema`` (the gated
        batch's own schema) makes the restart read robust to a ZERO-row
        pending dir, which parquet inference cannot read back."""
        if self._pending is not None and self._pending_bid < batch_id:
            return self._pending
        if self.txn_pending_dir is not None:
            older = [(b, d) for b, d in self._pending_dirs() if b < batch_id]
            if older:
                reader = spark.read if schema is None else spark.read.schema(schema)
                return reader.parquet(older[-1][1])
        return None

    def _write_pending(self, pending: DataFrame, batch_id: int) -> None:
        # The carry MUST be materialized, not kept as the lazy plan:
        # pending_B = filter(union(pending_{B-1}, batch_B)) recurses over
        # every earlier micro-batch, so the lazy chain re-scans the whole
        # log prefix at every gate evaluation and grows without bound on a
        # long-running stream. Persisted dir → re-read it (also what a
        # restart reads); in-memory only → localCheckpoint truncates the
        # lineage to the computed rows.
        self._pending_bid = batch_id
        if self.txn_pending_dir is None:
            self._pending = pending.localCheckpoint(eager=True)
            return
        pdir = os.path.join(self.txn_pending_dir, f"b{batch_id}")
        pending.write.mode("overwrite").parquet(pdir)
        self._pending = pending.sparkSession.read.schema(pending.schema).parquet(pdir)
        # keep this batch and the previous one (the foreachBatch replay
        # window); GC everything older
        for b, d in self._pending_dirs():
            if b < batch_id - 1:
                shutil.rmtree(d, ignore_errors=True)

    def requeue_quarantine(
        self, spark: SparkSession, *, schema: BaseSchema | None = None
    ) -> dict:
        """Dead-letter replay: re-validate the persisted quarantine rows
        under ``schema`` (default: the job's schema — pass a corrected or
        relaxed one after a rule fix) and merge the now-valid rows into the
        sink. The reference's recovery story is "fix the data, re-run the
        whole pipeline" (wprdc-etl keeps failed rows nowhere); here the
        quarantine IS the replay source, so recovery costs O(bad rows), not
        O(log).

        Exactly-once, multi-round. Each quarantine dir carries a
        *generation* suffix (``batch_id=7`` is gen 0; after a partial drain
        it is rewritten as ``batch_id=7.g1``, then ``.g2``, ...). A
        generation's merge commits under job ``<name>:requeue:g<gen>`` with
        the ORIGINAL batch_id, and the generation only advances when the
        post-merge rewrite of the dir succeeds — so a crash between the
        merge and the rewrite re-reads the same generation, the sink guard
        skips the duplicate merge, and the rewrite completes. A LATER
        requeue (after a further schema fix) sees the bumped generation and
        merges under a fresh guard key, so still-bad rows are never
        stranded. (Contract: retry a *crashed* requeue with the same schema
        — the skipped merge committed that generation's valid set, so the
        rewrite keeps only its still-bad rows.) Batches drain in ascending
        numeric batch_id order, matching the sink's monotone per-job guard.
        Requeued rows are SAFE regardless of how late they arrive: the
        sequence-aware LWW merge can never regress a key the table has
        since superseded.

        Returns ``{batch_id: {"requeued": n, "still_bad": n}}``.
        """
        import os
        import re
        import shutil
        import uuid

        self._require_built()
        assert self._sink is not None and self._payload_schema is not None
        if self.quarantine_dir is None:
            raise InvalidConfigException(
                "requeue_quarantine needs the job built with quarantine_dir"
            )
        sch = schema or self._payload_schema
        out: dict = {}
        if not os.path.isdir(self.quarantine_dir):
            return out
        dirs: list[tuple[int, int, str]] = []  # (bid, gen, dirname)
        for name in os.listdir(self.quarantine_dir):
            m = re.fullmatch(r"batch_id=(\d+)(?:\.g(\d+))?", name)
            if m:
                dirs.append((int(m.group(1)), int(m.group(2) or 0), name))
        for bid, gen, name in sorted(dirs):
            d = os.path.join(self.quarantine_dir, name)
            applied = sch.apply(spark.read.parquet(d).drop("_errors"))
            row_ok = (F.size(F.col("_errors")) == 0) & ~(
                (F.col("op") != "D") & F.col("content").isNull()
            )
            applied = applied.persist()
            try:
                valid = applied.where(row_ok).drop("_errors")
                bad = applied.where(~row_ok).withColumn(
                    "_errors", F.concat_ws("; ", F.col("_errors"))
                )
                n_ok = valid.count()
                n_bad = bad.count()
                if self.compute_content_sha:
                    valid = with_content_sha(valid)
                rjob = f"{self.name}:requeue:g{gen}"
                res = self._sink.merge(
                    valid,
                    job=rjob,
                    batch_id=bid,
                    counts=LineageCounts(extra={"requeued": n_ok, "still_bad": n_bad}),
                )
                if not res.applied and self._sink.last_committed_batch(rjob) != bid:
                    # guard skipped and NOT the designed crash-replay (which
                    # commits exactly this bid): the batch-id namespace
                    # regressed (fresh checkpoint, shared quarantine dir).
                    # Deleting the dir here would silently discard rows the
                    # sink never saw — leave it intact and surface the
                    # conflict instead.
                    out[bid] = {
                        "requeued": 0,
                        "still_bad": int(n_ok + n_bad),
                        "skipped": "guard-conflict: sink already past "
                        f"batch_id {bid} for {rjob}",
                    }
                    continue
                if n_bad:
                    # never overwrite a dir Spark is lazily reading from:
                    # write aside, then swap under the NEXT generation's name
                    tmp = os.path.join(
                        self.quarantine_dir, f".requeue_tmp_{uuid.uuid4().hex}"
                    )
                    bad.write.mode("overwrite").parquet(tmp)
                    shutil.rmtree(d, ignore_errors=True)
                    os.rename(tmp, os.path.join(
                        self.quarantine_dir, f"batch_id={bid}.g{gen + 1}"
                    ))
                else:
                    shutil.rmtree(d, ignore_errors=True)
            finally:
                applied.unpersist()
            out[bid] = {"requeued": int(n_ok), "still_bad": int(n_bad)}
        return out

    # ---- batch replay (B13 replay windows) ---------------------------------

    def bootstrap_snapshot(
        self,
        snapshot_df: DataFrame,
        *,
        as_of_seq: int,
        batch_id: int = -1,
    ) -> None:
        """Debezium-``snapshot.mode=initial`` analog: seed the target from a
        CONSISTENT snapshot of the upstream table taken at log position
        ``as_of_seq``, then hand off to the incremental tail
        (``source(..., since_sequence=as_of_seq)`` / ``run_batch``).

        Each snapshot row becomes a synthetic ``'I'`` event stamped
        ``event_sequence = as_of_seq`` and flows through the ordinary
        validated merge as ONE guarded commit — so the bootstrap inherits
        validation/quarantine, content_sha, lineage, and exactly-once replay
        for free, and at 100 TB it is the same bucketed bulk merge as any
        other batch (no special initial-load path to scale separately).

        The handoff is overlap-safe WITHOUT coordination: a re-delivered
        event with ``seq < as_of_seq`` loses the metadata LWW to the
        snapshot image (which already reflects it); ``seq > as_of_seq``
        outranks the snapshot; ``seq == as_of_seq`` carries the identical
        image by the snapshot's own consistency (and 'U' outranks the
        synthetic 'I' on the op tiebreak, converging to the same content).
        A key deleted at or before ``as_of_seq`` is simply absent from the
        snapshot — no tombstone manufacturing needed.

        Parity: wprdc-etl has no incremental mode — every cron run re-loads
        the full extract (``pipeline/pipeline.py::Pipeline.run``, SURVEY
        §4.1); this reframes that full load as the initial position of an
        incremental tail.

        ``batch_id`` defaults to **-1**: the guard position strictly before
        any tail batch, so both ``run_batch`` (ids from 0) and a streaming
        tail (micro-batch ids from 0) compose without colliding with the
        bootstrap's exactly-once guard — while a crash-replay of the
        bootstrap itself (same id) is still skipped.

        A consistent snapshot is COMPLETE full-image state by definition, so
        the two event-stream-shaped stages are bypassed for this one batch:
        transaction gating (snapshot rows carry no txn columns and are not
        part of any in-flight transaction) and patch normalization (a NULL
        in a snapshot is a true NULL, not 'unchanged'). The tail that
        follows gates/patches normally.
        """
        self._require_built()
        assert self._sink is not None
        cols = set(snapshot_df.columns)
        # validate against the SINK's actual merge keys, not a hardcoded
        # (repo, path, commit): custom-keyed sinks must be bootstrappable,
        # and a snapshot carrying the defaults but missing a custom key
        # must be rejected (r3 code review)
        from wprdc_etl_spark.plans.lake import load_manifest_keys

        load_manifest_keys(self._sink)
        sink_keys = list(getattr(self._sink, "keys", ("repo", "path", "commit")))
        missing = [k for k in sink_keys if k not in cols]
        if missing:
            raise InvalidConfigException(
                f"snapshot is missing key column(s) {missing}; a consistent "
                f"snapshot must carry the sink's full merge key {sink_keys}"
            )
        payload = [
            f
            for f in self._event_schema.fields
            if f.name not in ("event_sequence", "event_ts", "op")
        ]
        ev = snapshot_df.select(
            F.lit(int(as_of_seq)).cast("long").alias("event_sequence"),
            F.lit(None).cast("timestamp").alias("event_ts"),
            F.lit("I").alias("op"),
            *[
                (F.col(f.name) if f.name in cols else F.lit(None).cast(f.dataType)).alias(
                    f.name
                )
                for f in payload
            ],
        )
        self._sink.ensure(self.target_schema())
        gate, patch = self.txn_gate, self.patch
        self.txn_gate, self.patch = None, False
        try:
            self.apply_batch(ev, batch_id)
        finally:
            self.txn_gate, self.patch = gate, patch

    def run_batch(
        self,
        spark: SparkSession,
        *,
        n_chunks: int = 1,
        start_batch_id: int = 0,
        max_sequence_exclusive: int | None = None,
    ) -> int:
        """Replay the whole log in ``n_chunks`` deterministic sequence-range
        batches (1 = one big batch). Returns the last batch_id applied.
        Chunking by sequence range (not by file) makes replay results
        batch-plan-independent and restartable mid-way."""
        self._require_built()
        df = self._decode(
            spark.read.schema(self._scan_schema())
            .format(self._source_format)
            .load(self._source_path)
        )
        if max_sequence_exclusive is None:
            max_sequence_exclusive = (df.agg(F.max("event_sequence")).collect()[0][0] or 0) + 1
        self._sink.ensure(self.target_schema())  # type: ignore[union-attr]
        # after a snapshot bootstrap the tail starts past the watermark —
        # chunk the REMAINING range, not [0, max)
        base = 0 if self.since_sequence is None else self.since_sequence + 1
        span = max(0, max_sequence_exclusive - base)
        step = max(1, (span + n_chunks - 1) // n_chunks)
        last_id = start_batch_id - 1
        for idx in range(n_chunks):
            lo, hi = base + idx * step, min(base + (idx + 1) * step, max_sequence_exclusive)
            if lo >= max_sequence_exclusive:
                break
            chunk = df.where((F.col("event_sequence") >= lo) & (F.col("event_sequence") < hi))
            last_id = start_batch_id + idx
            self.apply_batch(chunk, last_id)
        return last_id

    # ---- streaming (B1/B2/B3/B13) ------------------------------------------

    def start_stream(self, spark: SparkSession, checkpoint: str, *, available_now: bool = True):
        """Tail the log dir as a Structured Streaming file source. The
        checkpoint holds source offsets + dedup state (B13); the sink guard
        covers the foreachBatch at-least-once gap (B8)."""
        self._require_built()
        self._sink.ensure(self.target_schema())  # type: ignore[union-attr]
        if self.txn_gate is not None and self.txn_pending_dir is None:
            # fault-tolerance: on the streaming path the pending carry must
            # survive both driver restarts AND executor loss (the in-memory
            # localCheckpoint carry dies with its executor's block store) —
            # default it next to the stream's own checkpoint
            self.txn_pending_dir = os.path.join(checkpoint, "txn_pending")
        paths = (
            self._source_path
            if isinstance(self._source_path, list)
            else [self._source_path]
        )

        def one(p):
            return self._decode(
                spark.readStream.schema(self._scan_schema())
                .option("maxFilesPerTrigger", self.max_files_per_trigger)
                .format(self._source_format)
                .load(p)
            )

        stream = one(paths[0])
        for p in paths[1:]:
            stream = stream.unionByName(one(p))
        if self.stream_dedup == "state":
            stream = dedup_events_streaming(stream, watermark_delay=self.watermark_delay)
        writer = (
            stream.writeStream.option("checkpointLocation", checkpoint)
            .foreachBatch(lambda df, bid: self.apply_batch(df, bid))
            .queryName(self.name)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
