"""Bench harness — sustained CDC apply throughput (BASELINE.json metric).

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The event-log size scales with sf (sf0.1 → 2M events). Headline queries:

- ``cdc_replay_batch``   — full batch replay, 4 sequence-range chunks, into a
  fresh ParquetSnapshotTable (B1..B12 composed; the BASELINE metric path).
- ``cdc_incremental``    — a 1%-sized incremental batch merged into the big
  table (the steady-state CDC case; exercises the broadcast merge +
  copy-on-write bucket path).
- ``cdc_replay_stream``  — Structured Streaming availableNow over the same
  log (micro-batched; stateful dedup + checkpoint overhead included).
- ``dedup`` / ``latest_per_key`` / ``fingerprint`` — individual hot operators.
- ``doc_minhash_lsh`` / ``doc_quality_langid`` / ``emb_near_dup`` — the
  training-data pipeline ops over the driver's documents/embeddings tables
  (production xxhash64 leaves, not the oracle-parity sha2 variants).

Extra keys (events_per_sec) ride along; the scaling-efficiency evidence
(local[8] vs local[32]) lives in scripts/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from wprdc_etl_spark.config import EngineConfig, build_session  # noqa: E402
from wprdc_etl_spark.operators.dedup import dedup_events  # noqa: E402
from wprdc_etl_spark.operators.fingerprint import with_content_sha  # noqa: E402
from wprdc_etl_spark.operators.latest import latest_per_key  # noqa: E402
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable  # noqa: E402
from wprdc_etl_spark.streaming.job import IngestJob  # noqa: E402
from wprdc_etl_spark.testgen import gen_change_events, write_event_log  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVENTS_PER_SF = 20_000_000  # sf0.1 → 2M events
BENCH_TMP = os.path.join(REPO, ".bench_tmp")


def sf_of(sf_dir: str) -> float:
    label = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(label.replace("sf", ""))
    except ValueError:
        return 0.1


def ensure_log(spark, n_events: int) -> str:
    path = os.path.join(REPO, ".fixtures", "bench", f"events_{n_events}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_event_log(gen_change_events(spark, n_events), path, n_files=64)
    return path


def timed(fn, repeats: int = 1):
    """Best-of-N wall time — this sandbox shows multi-× noisy-neighbor
    variance on identical runs; min is the least-interfered estimate (and
    the first run warms the page cache for the second)."""
    best = None
    for _ in range(repeats):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main() -> None:
    sf = sf_of(SF_DIR)
    n_events = max(10_000, int(EVENTS_PER_SF * sf))
    cfg = EngineConfig(
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 32),
        n_buckets=64,
        app_name="wprdc-etl-spark-bench",
    )
    spark = build_session(cfg)
    spark.sparkContext.setLogLevel("ERROR")
    log = ensure_log(spark, n_events)
    events = spark.read.parquet(log)
    total_events = events.count()
    shutil.rmtree(BENCH_TMP, ignore_errors=True)

    queries: dict[str, float] = {}

    # individual hot operators (count() forces full evaluation, no collect)
    queries["dedup"] = timed(lambda: dedup_events(events).count())
    queries["latest_per_key"] = timed(
        lambda: latest_per_key(dedup_events(events)).count()
    )
    queries["fingerprint"] = timed(
        lambda: with_content_sha(events.where(F.col("content").isNotNull()))
        .select(F.sum(F.crc32(F.col("content_sha"))))
        .collect()
    )

    # headline: full batch replay
    def replay_batch():
        shutil.rmtree(os.path.join(BENCH_TMP, "tbl"), ignore_errors=True)
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64
        )
        job = (
            IngestJob("bench")
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        job.run_batch(spark, n_chunks=4)

    queries["cdc_replay_batch"] = timed(replay_batch, repeats=2)

    # steady-state: small incremental batch against the populated table
    def incremental():
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64
        )
        job = (
            IngestJob("bench")
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        inc = gen_change_events(spark, max(1000, n_events // 100)).withColumn(
            "event_sequence", F.col("event_sequence") + 2 * n_events
        )
        job.apply_batch(inc, batch_id=100)

    queries["cdc_incremental"] = timed(incremental)

    # streaming replay (fresh table + checkpoint per run, so repeats measure
    # a full replay instead of a drained-checkpoint no-op)
    def replay_stream():
        shutil.rmtree(os.path.join(BENCH_TMP, "stbl"), ignore_errors=True)
        shutil.rmtree(os.path.join(BENCH_TMP, "ckpt"), ignore_errors=True)
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "stbl"), n_buckets=64
        )
        job = (
            IngestJob("bench-stream", max_files_per_trigger=16, watermark_delay="48 hours")
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        job.start_stream(spark, os.path.join(BENCH_TMP, "ckpt")).awaitTermination()

    queries["cdc_replay_stream"] = timed(replay_stream, repeats=2)

    # MOR steady-state: per-batch apply cost after the table is populated
    def incremental_mor():
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64, write_mode="mor"
        )
        job = (
            IngestJob("bench")
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        inc = gen_change_events(spark, max(1000, n_events // 100)).withColumn(
            "event_sequence", F.col("event_sequence") + 3 * n_events
        )
        job.apply_batch(inc, batch_id=101)

    queries["cdc_incremental_mor"] = timed(incremental_mor)

    # training-data pipeline ops over the driver's real tables (production
    # variants: xxhash64 leaves, not the oracle-parity sha2 ones)
    from wprdc_etl_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures
    from wprdc_etl_spark.functions.similarity import cosine_near_dup_pairs
    from wprdc_etl_spark.functions.text import lang_id, quality_score

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    queries["doc_minhash_lsh"] = timed(
        lambda: lsh_candidate_pairs(
            minhash_signatures(docs, n_hashes=32, shingle_k=5), n_bands=8
        ).count()
    )
    queries["doc_quality_langid"] = timed(
        lambda: docs.select(
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        .select(F.count_distinct("lang_pred"), F.sum("quality"))
        .collect()
    )
    queries["emb_near_dup"] = timed(
        lambda: cosine_near_dup_pairs(emb, dim=64, threshold=0.4).count()
    )

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "cdc_apply_total_sec",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "extra": {
                    "n_events": total_events,
                    "cpus": CPUS,
                    "batch_events_per_sec": round(total_events / queries["cdc_replay_batch"]),
                    "stream_events_per_sec": round(total_events / queries["cdc_replay_stream"]),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
