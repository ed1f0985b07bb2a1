"""Sustained-replay anchor at 10^8 change events (north-rule headline metric).

BASELINE.json's metric is "sustained change-events/sec applied (log-tail →
merge) on 10^10-event replay ... with final-state sha256 equality vs
reference; scaling efficiency ≥ 0.8".  10^10 events don't fit one sandbox
box, so the demonstrated ladder is: bench.py sf0.1 (2.06M events, the
per-round official artifact) → scaling bench (20.6M, the N→4N efficiency
evidence) → THIS script (10^8, 5× the largest prior demonstration) — each
running the IDENTICAL IngestJob plan (sequence-range chunked replay into a
bucketed ParquetSnapshotTable merge).

What it measures and proves:

  1. sustained apply rate — the log is replayed in ``--n-chunks`` sequential
     sequence-range commits; per-commit walls are reported so "sustained"
     is evidenced by the commit-over-commit trend (a plan whose cost grew
     with accumulated table size would slow down; the bucketed
     copy-on-write merge touches only affected buckets, so it must not).
  2. replay reconvergence (the north rule's exactly-once invariant) — a
     second replay of the same log under a DIFFERENT chunking (different
     commit boundaries = a different checkpoint schedule) must land the
     byte-identical final state: order-insensitive ``state_fingerprint``
     over EVERY output column, including ``content_sha`` (the per-row
     sha256(content) invariant from BASELINE.json's input_hint).

Rows are generated light (``--content-reps 20`` → ~350 B mean content) so
10^8 events fit the box's disk comfortably; the per-event apply work —
validate, LWW by (key, sequence), bucketed merge, commit — is unchanged.

Usage:  python scripts/replay_anchor.py [--events 100000000] [--n-chunks 8]
        [--verify-chunks 3] [--cpus 32] [--content-reps 20]
Prints one JSON line; run scripts/hwprobe.py before/after for the window
bracket (BENCH/BASELINE.md window-quality rule).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from wprdc_etl_spark.config import EngineConfig, build_session  # noqa: E402
from wprdc_etl_spark.operators.fingerprint import state_fingerprint  # noqa: E402
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable  # noqa: E402
from wprdc_etl_spark.streaming.job import IngestJob  # noqa: E402
from wprdc_etl_spark.testgen import gen_change_events, write_event_log  # noqa: E402


def build_job(spark, log: str, target: str, n_buckets: int) -> tuple[IngestJob, ParquetSnapshotTable]:
    shutil.rmtree(target, ignore_errors=True)
    table = ParquetSnapshotTable(spark, target, n_buckets=n_buckets)
    job = (
        IngestJob(f"replay-anchor-{os.path.basename(target)}")
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    return job, table


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--n-chunks", type=int, default=8)
    ap.add_argument("--verify-chunks", type=int, default=3,
                    help="chunk count for the reconvergence replay (must "
                         "differ from --n-chunks to move commit boundaries)")
    ap.add_argument("--content-reps", type=int, default=20)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--skip-verify", action="store_true")
    args = ap.parse_args()

    spark = build_session(
        EngineConfig(
            app_name="replay-anchor",
            master=f"local[{args.cpus}]",
            shuffle_partitions=64,
            n_buckets=args.n_buckets,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    log = os.path.join(REPO, ".fixtures", "bench",
                       f"events_{args.events}_r{args.content_reps}")
    t_gen = 0.0
    if not os.path.exists(os.path.join(log, "_SUCCESS")):
        t0 = time.monotonic()
        write_event_log(
            gen_change_events(spark, args.events, content_reps_max=args.content_reps),
            log,
            n_files=max(64, args.events // 400_000),
        )
        t_gen = round(time.monotonic() - t0, 1)
    total = spark.read.parquet(log).count()
    du = sum(os.path.getsize(os.path.join(log, f)) for f in os.listdir(log))
    print(f"## log ready: {total} events, {du / 1e9:.2f} GB, gen={t_gen}s", flush=True)

    scratch = os.path.join(REPO, ".bench_tmp")

    # --- phase A: sustained chunked replay, per-commit walls ---------------
    job, table = build_job(spark, log, os.path.join(scratch, "replay_a"), args.n_buckets)
    max_seq = (
        spark.read.parquet(log).agg(F.max("event_sequence")).collect()[0][0] or 0
    ) + 1
    table.ensure(job.target_schema())
    step = max(1, (max_seq + args.n_chunks - 1) // args.n_chunks)
    src = job._decode(spark.read.schema(job._scan_schema()).parquet(log))
    per_commit: list[float] = []
    t_all = time.monotonic()
    for idx in range(args.n_chunks):
        lo, hi = idx * step, min((idx + 1) * step, max_seq)
        if lo >= max_seq:
            break
        t0 = time.monotonic()
        job.apply_batch(
            src.where((F.col("event_sequence") >= lo) & (F.col("event_sequence") < hi)),
            idx,
        )
        per_commit.append(round(time.monotonic() - t0, 1))
        free_gb = shutil.disk_usage("/").free / 1e9
        print(f"## commit {idx}: [{lo},{hi}) {per_commit[-1]}s disk_free_gb={free_gb:.1f}", flush=True)
    wall = time.monotonic() - t_all
    final_rows = table.read().count()
    cols = sorted(table.read().columns)
    fp_a = state_fingerprint(table.read(), cols)

    out = {
        "events": total,
        "log_gb": round(du / 1e9, 2),
        "cpus": args.cpus,
        "n_chunks": args.n_chunks,
        "per_commit_s": per_commit,
        "wall_s": round(wall, 1),
        "events_per_sec": round(total / wall),
        "final_rows": final_rows,
        "fingerprint_cols": cols,
    }

    # --- phase B: reconvergence under a different commit schedule ----------
    if not args.skip_verify:
        job_b, table_b = build_job(spark, log, os.path.join(scratch, "replay_b"), args.n_buckets)
        t0 = time.monotonic()
        job_b.run_batch(spark, n_chunks=args.verify_chunks)
        out["verify_chunks"] = args.verify_chunks
        out["verify_wall_s"] = round(time.monotonic() - t0, 1)
        fp_b = state_fingerprint(table_b.read(), cols)
        out["fp_equal"] = fp_a == fp_b
        shutil.rmtree(os.path.join(scratch, "replay_b"), ignore_errors=True)
        assert out["fp_equal"], f"reconvergence FAILED: {fp_a} != {fp_b}"

    shutil.rmtree(os.path.join(scratch, "replay_a"), ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
