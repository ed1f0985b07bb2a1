"""CLI entry point for cluster submission (north_rule: run via
``spark-submit --py-files``).

Package and submit:

    cd /root/repo && zip -r /tmp/wprdc_etl_spark.zip wprdc_etl_spark
    spark-submit --py-files /tmp/wprdc_etl_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        wprdc_etl_spark/__main__.py \
        --name repo_ingest --source /logs/change_events \
        --target /lake/source_code --checkpoint /ckpt/repo_ingest \
        --mode stream --n-buckets 4096

(or ``python -m wprdc_etl_spark ...`` locally; see scripts/submit.sh).

On a cluster with the Iceberg runtime jar, pass ``--sink iceberg
--target catalog.db.source_code`` and the IcebergTable drop-in is used.
"""

from __future__ import annotations

import argparse

from wprdc_etl_spark.config import EngineConfig, build_session
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.job import IngestJob


def _parse_zorder(arg: str | None) -> list[str] | None:
    """--zorder value -> compact(zorder_by=...): None (flag absent) keeps
    the persisted layout, 'none'/'' clears it ([]), otherwise the stripped
    column list."""
    if arg is None:
        return None
    cols = [c.strip() for c in arg.split(",") if c.strip()]
    if not cols or arg.strip().lower() == "none":
        return []
    return cols


def main() -> None:
    ap = argparse.ArgumentParser(prog="wprdc_etl_spark")
    ap.add_argument("--name", required=True, help="job name (lineage / guard key)")
    ap.add_argument("--source", help="change-event log directory (stream/batch modes)")
    ap.add_argument("--target", required=True, help="lake table root (or Iceberg table name)")
    ap.add_argument("--checkpoint", help="streaming checkpoint location (stream mode)")
    ap.add_argument("--mode",
                    choices=["stream", "batch", "compact", "rebucket", "changelog",
                             "export", "history", "rollback", "rollup", "optimize",
                             "replicate", "tag", "drop-tag", "requeue",
                             "delete", "update", "publish", "abort-staged",
                             "profile", "lookup", "sql", "vacuum", "lag", "schema-diff",
                             "index-sync", "grep", "scd2-sync", "joinview-sync",
                             "publish-all", "recover-txn", "abort-all",
                             "bootstrap", "add-constraint", "drop-constraint",
                             "merge-into", "add-generated", "drop-generated",
                             "drop-column"],
                    default="stream")
    ap.add_argument("--sink", choices=["parquet-snapshot", "iceberg"], default="parquet-snapshot")
    ap.add_argument("--n-buckets", type=int, default=4096)
    ap.add_argument("--retain-history", type=int, default=None,
                    help="keep the last K versions' data files for time "
                         "travel / changelog reads (GC policy). Persisted "
                         "as a table property at the next commit; omitted "
                         "= honor the table's persisted value (so "
                         "maintenance verbs never shrink the window)")
    ap.add_argument("--n-chunks", type=int, default=1, help="batch mode: replay chunks")
    ap.add_argument("--watermark-delay", default="48 hours")
    ap.add_argument("--lateness", default=None)
    ap.add_argument("--max-files-per-trigger", type=int, default=64)
    ap.add_argument("--continuous", action="store_true",
                    help="stream mode: keep tailing instead of availableNow-drain")
    ap.add_argument("--new-n-buckets", type=int, help="rebucket mode: target bucket count")
    ap.add_argument("--zorder", help="compact mode: comma-separated columns to "
                    "lay out along the Morton curve (OPTIMIZE ZORDER BY analog; "
                    "persists as a table property later maintenance keeps); "
                    "'none' clears the persisted layout")
    ap.add_argument("--from-version", type=int, help="changelog mode: starting table version")
    ap.add_argument("--to-version", type=int, default=None,
                    help="changelog mode: ending version (default: current); "
                         "rollback mode: version to restore (required)")
    ap.add_argument("--output", help="changelog/export/rollup mode: output directory")
    ap.add_argument("--since-seq", type=int, default=None,
                    help="export mode: emit live rows whose winning version's "
                         "sequence is >= this cutoff (incremental export on "
                         "the current snapshot; zone-map/manifest-stat pruned); "
                         "stream/batch modes: tail the log from AFTER this "
                         "position (the handoff half of a snapshot bootstrap)")
    ap.add_argument("--as-of-seq", type=int, default=None,
                    help="bootstrap mode: the log position the snapshot at "
                         "--source is consistent with (Debezium "
                         "snapshot.mode=initial; then tail with "
                         "--mode stream/batch --since-seq of the same value)")
    ap.add_argument("--quarantine-dir", default=None,
                    help="stream/batch: persist invalid rows (with per-field "
                         "errors) here, one dir per batch; requeue mode: "
                         "re-validate + merge them after a rule fix")
    ap.add_argument("--tag-name", default=None,
                    help="tag/drop-tag modes: the ref name (tagged versions "
                         "are exempt from snapshot expiration until dropped)")
    ap.add_argument("--constraint-name", default=None,
                    help="add-constraint/drop-constraint modes: constraint name")
    ap.add_argument("--check", default=None,
                    help="add-constraint mode: the CHECK expression (SQL); "
                         "existing rows are validated before the property "
                         "commits, and every later merge through any handle "
                         "enforces it")
    ap.add_argument("--bloom-keys", action="store_true",
                    help="write parquet bloom filters on the key columns "
                         "(~1.2 bytes/key per file): point lookups skip "
                         "row groups inside the routed bucket")
    ap.add_argument("--zorder-on-write", action="store_true",
                    help="sort each merge's bucket writes by the table's "
                         "persisted z-order curve (fitted by a prior "
                         "--mode compact --zorder ...): deltas stay "
                         "clustered between compactions at the cost of an "
                         "in-task sort per write")
    ap.add_argument("--column", default=None,
                    help="add-generated/drop-generated modes: the generated "
                         "column name")
    ap.add_argument("--expr", default=None,
                    help="add-generated mode: the GENERATED ALWAYS AS "
                         "expression (SQL over the table columns); merges "
                         "compute it when the batch lacks the column and "
                         "equality-assert it when a producer carries it")
    ap.add_argument("--dim", default=None,
                    help="joinview-sync mode: dim TABLE root")
    ap.add_argument("--dim-keys", default="lang",
                    help="joinview-sync mode: comma-separated dim merge keys")
    ap.add_argument("--on", default=None, metavar="FACT=DIM[,FACT=DIM...]",
                    help="joinview-sync mode: join column mapping "
                         "(default: identity over --dim-keys)")
    ap.add_argument("--group-cols", default="repo",
                    help="rollup mode: comma-separated grouping columns")
    ap.add_argument("--target-rows-per-bucket", type=int, default=4_000_000,
                    help="optimize mode: rebucket sizing target")
    ap.add_argument("--known-langs", default=None,
                    help="requeue mode: comma-separated corrected lang "
                         "vocabulary (the 'rule fix'); default: the builtin "
                         "set, which re-quarantines everything unchanged")
    ap.add_argument("--columns", default=None,
                    help="profile mode: comma-separated columns (default all)")
    ap.add_argument("--approx", action="store_true",
                    help="profile mode: HLL distinct counts (the 100-TB path)")
    ap.add_argument("--repo", default=None, help="lookup mode: repo key")
    ap.add_argument("--path", default=None, help="lookup mode: path key")
    ap.add_argument("--commit", default=None, help="lookup mode: commit key")
    ap.add_argument("--staged", action="store_true",
                    help="stream/batch modes: commit write-audit-publish "
                         "style — batches land on the version chain but "
                         "readers keep the published version until --mode "
                         "publish (parquet-snapshot sink only)")
    ap.add_argument("--where", default=None,
                    help="delete/update modes: SQL predicate over the table "
                         "columns (e.g. \"repo = 'org/forgotten'\")")
    ap.add_argument("--set", action="append", default=None, metavar="COL=EXPR",
                    help="update/merge-into modes: column assignment as a SQL "
                         "expression (repeatable); key/bucket columns are "
                         "rejected; in merge-into the expression sees both "
                         "sides as s.<col> / t.<col>")
    ap.add_argument("--update-all", action="store_true",
                    help="merge-into: WHEN MATCHED UPDATE every non-key table "
                         "column present in the source (instead of --set)")
    ap.add_argument("--update-where", default=None,
                    help="merge-into: condition on the update clause (s./t.)")
    ap.add_argument("--merge-delete", action="store_true",
                    help="merge-into: WHEN MATCHED DELETE (claims its rows "
                         "before the update clause sees them)")
    ap.add_argument("--delete-where", default=None,
                    help="merge-into: condition on the delete clause (s./t.)")
    ap.add_argument("--insert-all", action="store_true",
                    help="merge-into: WHEN NOT MATCHED INSERT the source "
                         "columns by name (absent table columns null-fill)")
    ap.add_argument("--insert-where", default=None,
                    help="merge-into: condition on the insert clause (s.)")
    ap.add_argument("--regex", action="store_true",
                    help="grep mode: treat --query as a regex (trigram query "
                         "planning over its provably-required literals)")
    ap.add_argument("--grace-minutes", type=int, default=60,
                    help="vacuum mode: unreferenced dirs younger than this "
                         "survive (protects in-flight writers)")
    ap.add_argument("--query", default=None,
                    help="sql mode: ANSI SQL over views t / t_lineage / "
                         "t_history")
    ap.add_argument("--max-rows", type=int, default=50,
                    help="sql mode: rows printed when no --output")
    ap.add_argument("--patch", action="store_true",
                    help="stream/batch modes: treat U events as partial "
                         "images (NULL = unchanged); normalize to full "
                         "images against the live table before validation "
                         "(operators/patch.py)")
    ap.add_argument("--patch-cols", default=None,
                    help="comma-separated NULL-means-unchanged columns "
                         "(default: every non-key payload column; implies "
                         "--patch)")
    ap.add_argument("--envelope", choices=["debezium", "maxwell", "canal"], default=None,
                    help="stream/batch modes: the source is JSONL connector "
                         "change records, decoded via sources/envelopes.py")
    ap.add_argument("--tables", default=None, metavar="NAME=ROOT[,NAME=ROOT...]",
                    help="publish-all/recover-txn/abort-all: the participant "
                         "tables (parquet-snapshot roots)")
    ap.add_argument("--coordinator", default=None,
                    help="publish-all/recover-txn/abort-all: intent-log "
                         "directory (atomic multi-table transaction stream)")
    ap.add_argument("--seq-field", default=None,
                    help="envelope modes: source field holding the total "
                         "order (debezium: lsn/pos/sequence; maxwell: xid/ts)")
    args = ap.parse_args()

    spark = build_session(EngineConfig(app_name=f"wprdc-etl-spark::{args.name}"))
    if args.sink == "iceberg":
        from wprdc_etl_spark.plans.iceberg import IcebergTable

        table = IcebergTable(spark, args.target)
    else:
        table = ParquetSnapshotTable(
            spark, args.target, n_buckets=args.n_buckets,
            retain_history=args.retain_history,
            bloom_filter_keys=args.bloom_keys,
            zorder_on_write=args.zorder_on_write,
        )

    job = (
        IngestJob(
            args.name,
            watermark_delay=args.watermark_delay,
            lateness=args.lateness,
            max_files_per_trigger=args.max_files_per_trigger,
            quarantine_dir=args.quarantine_dir,
            staged=args.staged,
            patch=args.patch,
            patch_cols=args.patch_cols.split(",") if args.patch_cols else None,
        )
    )
    if args.mode == "requeue":
        # dead-letter replay: re-validate quarantined rows (after a schema/
        # rule fix ships) and merge the now-valid ones, exactly-once per
        # original batch; still-bad rows stay quarantined
        if not args.quarantine_dir:
            ap.error("--quarantine-dir is required in requeue mode")
        sch = IngestJob.default_payload_schema()
        if args.known_langs:
            from wprdc_etl_spark.schema import event_payload_schema

            sch = event_payload_schema(
                [x.strip() for x in args.known_langs.split(",") if x.strip()]
            )
        job = job.schema(sch).sink(table)
        job._built = True  # requeue needs no source
        r = job.requeue_quarantine(spark)
        total_ok = sum(v["requeued"] for v in r.values())
        total_bad = sum(v["still_bad"] for v in r.values())
        print(f"requeue drained {total_ok} rows across {len(r)} batches; "
              f"{total_bad} still quarantined")
        spark.stop()
        return
    if args.mode == "rollup":
        # continuous aggregate refresh: cron this after (or alongside) the
        # ingest job — each run is a no-op, an O(|changes|) incremental
        # fold, or a bootstrap, decided by the view's stored source version
        from wprdc_etl_spark.plans.rollup import RollupView

        if not args.output:
            ap.error("--output (the rollup view directory) is required in rollup mode")
        if args.sink == "iceberg":
            ap.error("rollup mode currently supports the parquet-snapshot sink only")
        view = RollupView(
            spark, args.output, table,
            group_cols=[c.strip() for c in args.group_cols.split(",") if c.strip()],
        )
        r = view.refresh()
        print(f"rollup {r['mode']} at source version {r['source_version']} "
              f"-> {args.output}")
        spark.stop()
        return
    if args.mode == "replicate":
        # incremental table->table sync: cron this to keep a replica (another
        # region / a dev copy / a different bucket layout) current; the
        # cursor lives in the replica's manifest, exactly-once per version
        from wprdc_etl_spark.plans.replicate import TableReplicator

        if args.sink == "iceberg":
            ap.error("replicate mode currently supports the parquet-snapshot sink only")
        if not args.source:
            ap.error("--source (the SOURCE table root) is required in replicate mode")
        src = ParquetSnapshotTable(spark, args.source)
        rep = TableReplicator(src, table, job=args.name)
        r = rep.sync()
        print(f"replicate {r['mode']}: cursor at source version {r['cursor']}")
        spark.stop()
        return
    if args.mode in ("index-sync", "grep"):
        # trigram code-search index (operators/codesearch.py): --target is
        # the INDEX root, --source the document table root. Cron index-sync
        # next to the ingest job (cursor in the index manifest, exactly-once
        # per source version); grep answers literal queries bucket-pruned.
        from wprdc_etl_spark.operators.codesearch import TrigramIndex

        if args.sink == "iceberg":
            ap.error("index modes currently support the parquet-snapshot sink only")
        if not args.source:
            ap.error("--source (the document TABLE root) is required in index modes")
        src = ParquetSnapshotTable(spark, args.source)
        idx = TrigramIndex(spark, args.target, src, n_buckets=args.n_buckets)
        if args.mode == "index-sync":
            r = idx.sync()
            print(
                f"index-sync {r['mode']}: cursor at source version {r['cursor']} "
                f"(+{r.get('rows_upserted', 0)}/-{r.get('rows_deleted', 0)} postings)"
            )
        else:
            if not args.query:
                ap.error("--query (the search literal) is required in grep mode")
            out = idx.grep_regex(args.query) if args.regex else idx.grep(args.query)
            if args.output:
                out.write.mode("overwrite").parquet(args.output)
                print(f"grep result written to {args.output}")
            else:
                out.show(args.max_rows, truncate=False)
        spark.stop()
        return
    if args.mode == "scd2-sync":
        # accumulate SCD Type-2 history of --source into --target (the
        # dbt-snapshot verb): cron next to the ingest job; cursor in the
        # history table's manifest, exactly-once per source version
        from wprdc_etl_spark.plans.scd2 import Scd2Table

        if args.sink == "iceberg":
            ap.error("scd2-sync mode currently supports the parquet-snapshot sink only")
        if not args.source:
            ap.error("--source (the document TABLE root) is required in scd2-sync mode")
        src = ParquetSnapshotTable(spark, args.source)
        cols = args.columns.split(",") if args.columns else None
        h = Scd2Table(spark, args.target, src, track_cols=cols,
                      n_buckets=args.n_buckets)
        r = h.sync()
        print(
            f"scd2-sync {r['mode']}: cursor at source version {r['cursor']} "
            f"(+{r.get('rows_upserted', 0)} interval rows)"
        )
        spark.stop()
        return
    if args.mode in ("add-constraint", "drop-constraint"):
        # CHECK constraints are a persisted table property (Delta ADD
        # CONSTRAINT analog): add validates existing rows in one scan, then
        # every merge through ANY handle enforces the check with zero extra
        # scans (embedded assert rides the merge's first action)
        if args.sink == "iceberg":
            ap.error("constraint modes currently support the parquet-snapshot sink only")
        if not args.constraint_name:
            ap.error("--constraint-name is required in constraint modes")
        if args.mode == "add-constraint":
            if not args.check:
                ap.error("--check (the CHECK expression) is required in add-constraint mode")
            table.add_constraint(args.constraint_name, args.check)
            print(f"constraint {args.constraint_name!r} added: CHECK ({args.check})")
        else:
            table.drop_constraint(args.constraint_name)
            print(f"constraint {args.constraint_name!r} dropped")
        spark.stop()
        return
    if args.mode == "drop-column":
        if args.sink == "iceberg":
            if not args.column:
                ap.error("--column is required in drop-column mode")
            spark.sql(f"ALTER TABLE {args.target} DROP COLUMN {args.column}")
            print(f"column {args.column!r} dropped")
        else:
            if not args.column:
                ap.error("--column is required in drop-column mode")
            table.drop_column(args.column)
            print(f"column {args.column!r} dropped (metadata-only; compact() "
                  f"physically sheds the bytes)")
        spark.stop()
        return
    if args.mode in ("add-generated", "drop-generated"):
        if args.sink == "iceberg":
            ap.error("generated columns are a parquet-snapshot sink feature "
                     "(the Iceberg spec has no generated columns)")
        if not args.column:
            ap.error("--column is required in add-generated/drop-generated modes")
        if args.mode == "add-generated":
            if not args.expr:
                ap.error("--expr is required in add-generated mode")
            table.add_generated_column(args.column, args.expr)
            print(f"generated column {args.column!r} added: ({args.expr})")
        else:
            table.drop_generated_column(args.column)
            print(f"generated column {args.column!r} dropped (values kept as "
                  f"ordinary data)")
        spark.stop()
        return
    if args.mode == "joinview-sync":
        # maintain a fact⟕dim materialized join view in --target from the
        # changelogs of --source (fact table) and --dim: cron next to the
        # ingest job; cursor = the (fact_version, dim_version) pair in the
        # view table's manifest, exactly-once per version pair
        from wprdc_etl_spark.plans.joinview import JoinView

        if args.sink == "iceberg":
            ap.error("joinview-sync mode currently supports the parquet-snapshot sink only")
        if not args.source or not args.dim:
            ap.error("--source (fact TABLE root) and --dim (dim TABLE root) "
                     "are required in joinview-sync mode")
        dim_keys = args.dim_keys.split(",")
        fact = ParquetSnapshotTable(spark, args.source)
        dim = ParquetSnapshotTable(spark, args.dim, keys=dim_keys,
                                   bucket_keys=dim_keys)
        if args.on:
            on = dict(pair.split("=", 1) for pair in args.on.split(","))
        else:
            on = {k: k for k in dim_keys}
        cols = args.columns.split(",") if args.columns else None
        v = JoinView(spark, args.target, fact, dim, on=on, dim_cols=cols,
                     n_buckets=args.n_buckets)
        r = v.sync()
        print(
            f"joinview-sync {r['mode']}: cursor at (fact v{r['fact_version']}"
            f", dim v{r['dim_version']}) (+{r.get('rows_upserted', 0)} rows, "
            f"-{r.get('rows_deleted', 0)})"
        )
        spark.stop()
        return
    if args.mode == "optimize":
        # auto-maintenance: compact / rebucket / expire only when due, decided
        # from metadata alone (manifest / Iceberg metadata tables, no data
        # scan) — safe to cron every few minutes
        if args.sink == "iceberg":
            r = table.optimize()
        else:
            r = table.optimize(target_rows_per_bucket=args.target_rows_per_bucket)
        print(f"optimize plan={r['plan']} actions={r['actions'] or 'none (healthy)'}")
        spark.stop()
        return
    if args.mode in ("tag", "drop-tag"):
        if not args.tag_name:
            ap.error("--tag-name is required in tag/drop-tag modes")
        if args.mode == "tag":
            if args.sink == "iceberg":
                table.create_tag(args.tag_name, args.to_version)
                print(f"tag {args.tag_name!r} created")
            else:
                v = table.create_tag(args.tag_name, args.to_version)
                print(f"tag {args.tag_name!r} pins version {v}")
        else:
            table.drop_tag(args.tag_name)
            print(f"tag {args.tag_name!r} dropped")
        spark.stop()
        return
    if args.mode == "rollback":
        # disaster recovery: restore a past version as a NEW commit
        # (metadata-only on both sinks; forward history kept for audit).
        # Rolled-back batches lose their guard entries, so re-running the
        # ingest job from checkpoint re-applies them.
        if args.to_version is None:
            ap.error("--to-version is required in rollback mode")
        if args.sink == "iceberg":
            table.rollback(args.to_version)
            print(f"rolled back to snapshot {args.to_version}")
        else:
            v = table.rollback(args.to_version)
            print(f"restored version {args.to_version} as new version {v}")
        spark.stop()
        return
    if args.mode == "schema-diff":
        # pre-flight: what would merge() do with this batch's schema?
        # (plans/lake.py::plan_schema_changes — a clean report means the
        # merge cannot raise on schema grounds; blocking rows name why)
        if not args.source:
            ap.error("schema-diff mode requires --source (a batch to inspect)")
        from wprdc_etl_spark.plans.lake import plan_schema_changes

        batch_schema = spark.read.parquet(args.source).schema
        man_keys = getattr(table, "keys", [])
        bucket_keys = getattr(table, "bucket_keys", man_keys)
        rows = plan_schema_changes(
            table.read().schema, batch_schema, keys=man_keys, bucket_keys=bucket_keys
        )
        blocking = [r for r in rows if r["blocking"]]
        for r in rows:
            print(r)
        print(f"blocking: {len(blocking)}")
        spark.stop()
        if blocking:
            raise SystemExit(3)
        return
    if args.mode == "lag":
        # consumer-lag / freshness SLO numbers vs the log head
        # (operators/freshness.py::lag_report)
        if not args.source:
            ap.error("lag mode requires --source (the change-event log)")
        from wprdc_etl_spark.operators.freshness import lag_report

        log_df = spark.read.parquet(*(args.source if isinstance(args.source, list) else [args.source]))
        for r in lag_report(log_df, table, args.name).collect():
            print(r.asDict())
        spark.stop()
        return
    if args.mode == "profile":
        # data-quality acceptance report: one global aggregate over the
        # table (operators/analytics.py::profile_table)
        from wprdc_etl_spark.operators.analytics import profile_table

        cols = [c.strip() for c in args.columns.split(",")] if args.columns else None
        for r in profile_table(table.read(), cols, approx=args.approx).collect():
            print(r.asDict())
        spark.stop()
        return
    if args.mode == "lookup":
        # bucket-pruned point lookup (no Spark job to find the bucket)
        if args.sink == "iceberg":
            ap.error("lookup mode supports the parquet-snapshot sink only")
        keys = {k: v for k, v in
                (("repo", args.repo), ("path", args.path), ("commit", args.commit))
                if v is not None}
        for r in table.lookup(**keys).collect():
            print(r.asDict())
        spark.stop()
        return
    if args.mode in ("publish-all", "recover-txn", "abort-all"):
        # atomic multi-table publish (plans/txn_commit.py): 2PC over the
        # participants' WAP chains — decide once in the coordinator's intent
        # log, then one metadata-only publish per table; recover-txn rolls
        # every decided-but-unfinished transaction forward after a crash
        from wprdc_etl_spark.plans.txn_commit import MultiTablePublish

        if args.sink == "iceberg":
            ap.error(f"{args.mode} supports the parquet-snapshot sink only")
        if not args.coordinator or not args.tables:
            ap.error(f"--mode {args.mode} requires --coordinator and --tables")
        tables = {}
        for spec in args.tables.split(","):
            name, _, root = spec.partition("=")
            if not root:
                ap.error(f"--tables entry {spec!r} is not NAME=ROOT")
            tables[name] = ParquetSnapshotTable(spark, root)
        co = MultiTablePublish(args.coordinator)
        if args.mode == "publish-all":
            out = co.publish_all(tables)
            for name, v in out.items():
                print(f"published {name} at version {v}")
        elif args.mode == "recover-txn":
            done = co.recover(tables)
            print(f"recovered {len(done)} transaction(s): {done}")
        else:
            out = co.abort_all(tables)
            for name, v in out.items():
                print(f"aborted staged chain on {name}; restored as version {v}")
        spark.stop()
        return
    if args.mode in ("publish", "abort-staged"):
        # close a write-audit-publish chain: make the staged batches visible
        # atomically, or restore the published state (staged batches lose
        # their guard entries and replay re-applies them)
        if args.sink == "iceberg":
            ap.error("publish/abort-staged support the parquet-snapshot sink only")
        staged = table.staged_versions()
        if args.mode == "publish":
            v = table.publish()
            print(f"published {len(staged)} staged version(s); now at version {v}")
        else:
            v = table.abort_staged()
            print(f"aborted {len(staged)} staged version(s); restored as version {v}")
        spark.stop()
        return
    if args.mode in ("delete", "update"):
        # row-level DML: compliance deletes / backfill corrections, routed
        # through the merge machinery (exactly-once, bucket-pruned rewrite,
        # time travel + changelog visibility) — see plans/lake.py DML verbs
        if not args.where:
            ap.error("--where is required in delete/update modes")
        if args.mode == "update" and not args.set:
            ap.error("--set COL=EXPR is required in update mode")
        sets = None
        if args.set:
            sets = {}
            for s in args.set:
                if "=" not in s:
                    ap.error(f"--set expects COL=EXPR, got {s!r}")
                c, e = s.split("=", 1)
                sets[c.strip()] = e.strip()
        if args.sink == "iceberg":
            if args.mode == "delete":
                table.delete_where(args.where)
                print(f"tombstoned rows matching {args.where!r}")
            else:
                table.update_where(sets, args.where)
                print(f"updated rows matching {args.where!r}")
        elif args.mode == "delete":
            r = table.delete_where(args.where)
            print(f"delete committed version {r.version}")
        else:
            r = table.update_where(args.where, sets)
            print(f"update committed version {r.version}")
        spark.stop()
        return
    if args.mode == "merge-into":
        # generic multi-clause MERGE INTO (Delta/Iceberg parity): the source
        # is an arbitrary parquet dir carrying the key columns; clauses map
        # 1:1 onto ParquetSnapshotTable.merge_into / IcebergTable.merge_into
        if not args.source:
            ap.error("--source (the merge source parquet dir) is required "
                     "in merge-into mode")
        upd = None
        if args.update_all:
            upd = "all"
        elif args.set:
            upd = {}
            for s in args.set:
                if "=" not in s:
                    ap.error(f"--set expects COL=EXPR, got {s!r}")
                c, e = s.split("=", 1)
                upd[c.strip()] = e.strip()
        ins = "all" if args.insert_all else None
        src = spark.read.parquet(args.source)
        r = table.merge_into(
            src,
            when_matched_update=upd,
            update_condition=args.update_where,
            when_matched_delete=args.merge_delete,
            delete_condition=args.delete_where,
            when_not_matched_insert=ins,
            insert_condition=args.insert_where,
        )
        if r is not None:
            print(f"merge-into committed version {r.version}")
        else:
            print("merge-into applied")
        spark.stop()
        return
    if args.mode == "sql":
        # ad-hoc ANSI SQL over the live table — the consumer surface:
        # `t` = current published state, `t_lineage` = the run log (A24
        # analog), `t_history` = commit metadata. Declarative all the way
        # down, so Catalyst pushes the query's filters/projections into the
        # same pruned scans the API paths use.
        if not args.query:
            ap.error("--query is required in sql mode")
        table.read().createOrReplaceTempView("t")
        if hasattr(table, "read_lineage"):
            table.read_lineage().createOrReplaceTempView("t_lineage")
        hist = table.history() if hasattr(table, "history") else []
        if hist:
            spark.createDataFrame(
                [{k: v for k, v in h.items() if not isinstance(v, (dict, list))} for h in hist]
            ).createOrReplaceTempView("t_history")
        out = spark.sql(args.query)
        if args.output:
            out.write.mode("overwrite").parquet(args.output)
            print(f"query result written to {args.output}")
        else:
            out.show(args.max_rows, truncate=False)
        spark.stop()
        return
    if args.mode == "export":
        # modified_since is a drop-in on BOTH sinks (zone maps on the
        # parquet snapshot table; manifest column stats on Iceberg)
        if args.since_seq is None or not args.output:
            ap.error("--since-seq and --output are required in export mode")
        table.modified_since(args.since_seq).write.mode("overwrite").parquet(args.output)
        print(f"incremental export (winners with seq >= {args.since_seq}) "
              f"written to {args.output}")
        spark.stop()
        return
    if args.mode == "vacuum":
        if args.sink == "iceberg":
            from wprdc_etl_spark.plans.iceberg import remove_orphans_sql

            spark.sql(remove_orphans_sql(args.target))
            print(f"remove_orphan_files submitted for {args.target}")
        else:
            rep = table.vacuum(grace_seconds=args.grace_minutes * 60)
            print(f"vacuum removed {len(rep['removed'])} orphan dir(s): "
                  f"{rep['removed']}; kept under grace: {rep['kept_grace']}")
        spark.stop()
        return
    if args.mode in ("compact", "rebucket", "changelog", "history"):
        if args.sink == "iceberg":
            # same verbs, expressed as Iceberg catalog procedures
            # (plans/iceberg.py builders; --from/--to versions are snapshot ids)
            if args.mode == "compact":
                zcols = _parse_zorder(args.zorder)
                table.compact(zorder_by=zcols)
                print(f"rewrite_data_files submitted for {args.target}"
                      + (f" (zorder {zcols})" if zcols else ""))
            elif args.mode == "rebucket":
                if not args.new_n_buckets:
                    ap.error("--new-n-buckets is required in rebucket mode")
                table.rebucket(args.n_buckets, args.new_n_buckets)
                print(f"partition spec evolved to bucket({args.new_n_buckets}, path)")
            elif args.mode == "history":
                for h in table.history():
                    print(h)
            else:
                if args.from_version is None or not args.output:
                    ap.error("--from-version and --output are required in changelog mode")
                ch = table.changes_between(args.from_version, args.to_version)
                ch.write.mode("overwrite").parquet(args.output)
                print(f"changelog written to {args.output}")
            spark.stop()
            return
        if args.mode == "compact":
            v = table.compact(zorder_by=_parse_zorder(args.zorder))
            print(f"compacted to version {v}"
                  + (f" (zorder by {args.zorder})"
                     if args.zorder and args.zorder.lower() != "none" else ""))
        elif args.mode == "rebucket":
            if not args.new_n_buckets:
                ap.error("--new-n-buckets is required in rebucket mode")
            v = table.rebucket(args.new_n_buckets)
            print(f"rebucketed to {args.new_n_buckets} buckets at version {v}")
        elif args.mode == "history":
            for h in table.history():
                print(h)
        else:  # changelog
            if args.from_version is None or not args.output:
                ap.error("--from-version and --output are required in changelog mode")
            ch = table.changes_between(args.from_version, args.to_version)
            ch.write.mode("overwrite").parquet(args.output)
            print(f"changelog v{args.from_version}->"
                  f"{args.to_version if args.to_version is not None else 'current'} "
                  f"written to {args.output}")
        spark.stop()
        return
    if not args.source:
        ap.error("--source is required in stream/batch/bootstrap modes")
    env_opts = {}
    if args.seq_field:
        key = "seq_field" if args.envelope == "debezium" else "seq_expr"
        env_opts[key] = args.seq_field
    job = (
        job.source(args.source, envelope=args.envelope, envelope_options=env_opts,
                   since_sequence=args.since_seq)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    if args.mode == "bootstrap":
        if args.as_of_seq is None:
            ap.error("--as-of-seq is required in bootstrap mode "
                     "(--source is the consistent snapshot parquet dir)")
        snap = spark.read.parquet(args.source)
        job.bootstrap_snapshot(snap, as_of_seq=args.as_of_seq)
        print(f"bootstrap complete: snapshot applied at log position "
              f"{args.as_of_seq}; tail with --mode stream/batch "
              f"--since-seq {args.as_of_seq}")
    elif args.mode == "batch":
        last = job.run_batch(spark, n_chunks=args.n_chunks)
        print(f"batch replay complete, last batch_id={last}")
    else:
        if not args.checkpoint:
            ap.error("--checkpoint is required in stream mode")
        q = job.start_stream(spark, args.checkpoint, available_now=not args.continuous)
        q.awaitTermination()
    spark.stop()


if __name__ == "__main__":
    main()
