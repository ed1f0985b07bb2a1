"""Rolling-log sustained-replay anchor at 10^9 change events.

BASELINE.json's metric is defined at 10^10-event scale; the sandbox ladder so
far is bench.py sf0.1 (2.06M) → scaling bench (20.6M) → replay_anchor.py
(1.03×10^8, full different-chunking reconvergence, fingerprint-equal).  This
script adds the next rung — **10^9 events, one order of magnitude from the
target scale** — by fixing the two resources that capped the 10^8 run:

  * disk: the log is never fully materialized.  ``gen_change_events`` is
    closed-form per event index, so each sequence-range segment
    [lo, hi) is generated, written as a real parquet log segment, scanned
    back through the IDENTICAL IngestJob decode→validate→merge path, then
    deleted.  Peak log footprint = one segment (~2.5×10^7 events ≈ 2.7 GB),
    regardless of total replay length — exactly how a real binlog tailer
    retires consumed segments.
  * state: ``--n-entities`` pins the key space (default 3.43×10^7 — the SAME
    key space as the 10^8 anchor, whose default was n_events//3), so the
    run reaches steady-state churn: after ~4 segments every commit is
    update/delete-dominated against a full-size table, and the per-commit
    wall trend isolates "does apply cost grow with accumulated table
    size?" — the north rule's sustained-rate question — from table growth.

What it proves at full scale (the 10^8 anchor already proved full
different-chunking reconvergence; re-running 10^9 twice would double the
wall for no new information):

  1. sustained apply rate over ``--n-chunks`` sequential commits with flat
     per-commit walls at steady-state table size;
  2. exactly-once under redelivery — the final segment is re-applied with
     its ORIGINAL batch_id (sink guard must no-op) and again as a NEW
     batch_id (LWW by (key, sequence) must keep every winner), and the
     order-insensitive all-column state fingerprint (incl. content_sha)
     must be byte-identical after both;
  3. generation-chunking invariance — tests/test_replay_rolling.py pins
     rolling replay ≡ one-shot replay (same fingerprint) at small scale,
     and chunked generation ≡ full-generation slice row-for-row.

Usage:  python scripts/replay_anchor_rolling.py [--events 1000000000]
        [--n-chunks 40] [--n-entities 34333677] [--content-reps 4]
        [--cpus 32] [--out BENCH/replay_anchor_1e9.json]
Runs scripts/hwprobe.py before/after (window bracket, BENCH/BASELINE.md
window-quality rule) and writes one JSON artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
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


def hwprobe() -> dict | None:
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "hwprobe.py")],
            capture_output=True, text=True, timeout=600,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def run_rolling(
    spark,
    *,
    events: int,
    n_chunks: int,
    n_entities: int,
    content_reps: int,
    n_buckets: int,
    scratch: str,
    keep_last_segment: bool = True,
    gen_files_per_chunk: int | None = None,
    progress: bool = True,
    write_mode: str = "mor",
) -> tuple[dict, "IngestJob", "ParquetSnapshotTable", str | None]:
    """Chunk-wise generate → scan → apply → retire. Returns (report, job,
    table, last_segment_path). Shared by the anchor CLI and the tiny-scale
    equivalence test.

    ``write_mode`` defaults to 'mor' (merge-on-read deltas + staggered
    inline compaction): every anchor batch touches all buckets, so COW
    rewrites the whole table per commit (write amplification ≈
    table/batch ≈ 7x at steady state) — the documented wrong choice for
    steady-state CDC. MOR is the LSM-style steady-state path the engine's
    own write_mode docstring prescribes; per-commit cost is O(batch +
    table/max_deltas), which is what a sustained-rate anchor should
    measure."""
    target = os.path.join(scratch, "rolling_target")
    shutil.rmtree(target, ignore_errors=True)
    table = ParquetSnapshotTable(spark, target, n_buckets=n_buckets, write_mode=write_mode)
    job = (
        IngestJob("replay-anchor-rolling")
        .source(os.path.join(scratch, "rolling_seg_*"))
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    table.ensure(job.target_schema())

    step = max(1, (events + n_chunks - 1) // n_chunks)
    per_commit: list[float] = []
    per_gen: list[float] = []
    applied_events = 0
    last_seg: str | None = None
    t_all = time.monotonic()
    for idx in range(n_chunks):
        lo, hi = idx * step, min((idx + 1) * step, events)
        if lo >= events:
            break
        seg = os.path.join(scratch, f"rolling_seg_{idx:04d}")
        t0 = time.monotonic()
        n_files = gen_files_per_chunk or max(32, (hi - lo) // 400_000)
        write_event_log(
            gen_change_events(
                spark, hi - lo, start=lo,
                n_entities=n_entities, content_reps_max=content_reps,
            ),
            seg,
            n_files=n_files,
        )
        t_gen = time.monotonic() - t0
        per_gen.append(round(t_gen, 1))
        # retire the PREVIOUS apply's shuffle files before this apply's
        # merge+compaction transient starts (deletion is async after the
        # GC; firing here gives the cleaner the whole apply to drain)
        spark.sparkContext._jvm.System.gc()

        t0 = time.monotonic()
        src = job._decode(spark.read.schema(job._scan_schema()).parquet(seg))
        job.apply_batch(src, idx)
        per_commit.append(round(time.monotonic() - t0, 1))
        applied_events += hi - lo

        if last_seg is not None:
            shutil.rmtree(last_seg, ignore_errors=True)
        last_seg = seg
        # Retire the PREVIOUS chunks' shuffle files too: ContextCleaner only
        # deletes them after a driver-JVM GC collects the ShuffleDependency
        # weak refs, and a 128 GB-heap driver never GCs on its own — the
        # first 10^9 attempt died of a 58 GB blockmgr dir at chunk 6 while
        # the table itself was 12 GB.  One System.gc() per multi-minute
        # chunk is microseconds of pause for a bounded scratch footprint.
        spark.sparkContext._jvm.System.gc()
        if progress:
            free_gb = shutil.disk_usage("/").free / 1e9
            print(
                f"## chunk {idx}: [{lo},{hi}) gen={per_gen[-1]}s "
                f"apply={per_commit[-1]}s disk_free_gb={free_gb:.1f}",
                flush=True,
            )
    wall = time.monotonic() - t_all
    if not keep_last_segment and last_seg is not None:
        shutil.rmtree(last_seg, ignore_errors=True)
        last_seg = None

    apply_wall = sum(per_commit)
    report = {
        "events": applied_events,
        "n_chunks": len(per_commit),
        "n_entities": n_entities,
        "content_reps_max": content_reps,
        "per_gen_s": per_gen,
        "per_commit_s": per_commit,
        "gen_wall_s": round(sum(per_gen), 1),
        "apply_wall_s": round(apply_wall, 1),
        "wall_s": round(wall, 1),
        "events_per_sec_apply": round(applied_events / apply_wall) if apply_wall else None,
        "events_per_sec_incl_gen": round(applied_events / wall) if wall else None,
    }
    return report, job, table, last_seg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000_000)
    ap.add_argument("--n-chunks", type=int, default=40)
    # default = the 10^8 anchor's key space (103001031 // 3), so the two
    # anchors share steady-state table size and per-commit walls compare.
    ap.add_argument("--n-entities", type=int, default=34_333_677)
    ap.add_argument("--content-reps", type=int, default=4)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--write-mode", choices=("auto", "cow", "mor"), default="mor")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "replay_anchor_1e9.json"))
    ap.add_argument("--skip-probes", action="store_true")
    args = ap.parse_args()

    hw_before = None if args.skip_probes else hwprobe()

    spark = build_session(
        EngineConfig(
            app_name="replay-anchor-rolling",
            master=f"local[{args.cpus}]",
            shuffle_partitions=64,
            n_buckets=args.n_buckets,
            extra_conf={
                "spark.ui.showConsoleProgress": "false",
                # backstop for the per-chunk System.gc() shuffle retirement
                "spark.cleaner.periodicGC.interval": "5min",
            },
        )
    )
    spark.sparkContext.setLogLevel("ERROR")

    scratch = os.path.join(REPO, ".bench_tmp", "rolling_1e9")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)

    report, job, table, last_seg = run_rolling(
        spark,
        events=args.events,
        n_chunks=args.n_chunks,
        n_entities=args.n_entities,
        content_reps=args.content_reps,
        n_buckets=args.n_buckets,
        scratch=scratch,
        write_mode=args.write_mode,
    )
    report["write_mode"] = args.write_mode
    report["cpus"] = args.cpus
    cols = sorted(table.read().columns)
    report["final_rows"] = table.read().count()
    report["fingerprint_cols"] = cols
    fp0 = state_fingerprint(table.read(), cols)
    print(f"## final rows={report['final_rows']} fp={fp0[:16]}…", flush=True)

    # --- exactly-once probes at full scale ---------------------------------
    assert last_seg is not None
    src = job._decode(spark.read.schema(job._scan_schema()).parquet(last_seg))
    n_applied = report["n_chunks"]

    t0 = time.monotonic()
    job.apply_batch(src, n_applied - 1)  # redelivery, ORIGINAL batch_id
    report["redeliver_same_batch_s"] = round(time.monotonic() - t0, 1)
    fp1 = state_fingerprint(table.read(), cols)
    report["redeliver_same_batch_noop"] = fp1 == fp0

    t0 = time.monotonic()
    job.apply_batch(src, n_applied)  # replay as a NEW batch: LWW must hold
    report["reapply_new_batch_s"] = round(time.monotonic() - t0, 1)
    fp2 = state_fingerprint(table.read(), cols)
    report["reapply_new_batch_lww_noop"] = fp2 == fp0

    shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()

    hw_after = None if args.skip_probes else hwprobe()
    out = {
        "what": (
            "rolling-log sustained replay at 10^9 events "
            "(scripts/replay_anchor_rolling.py): segments generated/retired "
            "in-flight, bounded key space -> steady-state churn; exactly-once "
            "probes (same-batch-id redelivery + new-batch-id LWW replay) at "
            "full scale"
        ),
        "run": report,
        "hw_brackets": {"before": hw_before, "after": hw_after},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w", encoding="utf-8") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not isinstance(v, list)}))
    ok = report["redeliver_same_batch_noop"] and report["reapply_new_batch_lww_noop"]
    print(f"## exactly-once probes: {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
