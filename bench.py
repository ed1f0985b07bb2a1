"""Bench harness — sustained CDC apply throughput (BASELINE.json metric).

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The event-log size scales with sf (sf0.1 → 2M events). Headline queries:

- ``cdc_bulk_load``      — the whole log applied as ONE batch into a fresh
  table (pure sustained-apply throughput; the cleanest events/s number).
- ``cdc_replay_batch``   — checkpointed replay in 2 sequence-range chunks
  into a fresh table (the resume-from-checkpoint path: chunk 2 merges into
  chunk 1's table state, exercising the incremental bucket rewrite).
- ``cdc_incremental``    — a 1%-sized incremental batch merged into the big
  table (steady-state CDC; copy-on-write bucket path).
- ``cdc_incremental_mor`` — same, merge-on-read delta path.
- ``cdc_replay_stream``  — Structured Streaming availableNow over the same
  log (micro-batched; stateful dedup + checkpoint overhead included).
  Sized to 2 triggers (= batch's 2 chunks) since round 4; r1–r3 recorded
  4-trigger values — compare those against 2× the per-commit cost.
- ``dedup`` / ``latest_per_key`` / ``fingerprint`` — individual hot operators.
- ``doc_minhash_lsh`` / ``doc_quality_langid`` / ``emb_near_dup`` — the
  training-data pipeline ops over the driver's documents/embeddings tables
  (production xxhash64 leaves, not the oracle-parity sha2 variants).

NOISE ROBUSTNESS (VERDICT r2 #1): this VM shows ±2–4× noisy-neighbor
variance on identical runs, and round 2's official artifact caught an
unlucky window on the one heavy query it repeated back-to-back. All queries
now run ``REPEATS`` times with the repetitions INTERLEAVED across queries
(rep 1 of everything, then rep 2 of everything, ...), so a noise burst
lands on at most one rep of each query instead of both reps of one; the
reported time is the per-query minimum (least-interfered estimate), and
``extra.rep_times`` carries every raw rep so regressions are
distinguishable from noise after the fact. When the interleaved reps of
any non-trivial query disagree by >2x — direct evidence the window is
contended — up to ``MAX_REPEATS`` total repetitions run before reporting
(``extra.repeats`` records how many actually ran). The scaling-efficiency evidence
(local[8] vs local[32] / 1 vs 4 executors) lives in
scripts/scaling_bench.py → BENCH/BASELINE.md.

Note: the driver wraps this script and writes BENCH_r{N}.json; top-level
fields there other than "parsed"/"tail" (e.g. "n", "rc", "cpus") are
driver-added, not produced here.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
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
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
MAX_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_REPEATS", str(REPEATS + 2)))
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

    def mk_job(table):
        return (
            IngestJob("bench")
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )

    # ---- query thunks (run order within a rep matters: the incremental
    # queries merge into the table cdc_replay_batch leaves populated) ------

    def q_dedup():
        dedup_events(events).count()

    def q_latest_per_key():
        latest_per_key(dedup_events(events)).count()

    def q_fingerprint():
        with_content_sha(events.where(F.col("content").isNotNull())).select(
            F.sum(F.crc32(F.col("content_sha")))
        ).collect()

    def q_bulk_load():
        shutil.rmtree(os.path.join(BENCH_TMP, "btbl"), ignore_errors=True)
        mk_job(
            ParquetSnapshotTable(spark, os.path.join(BENCH_TMP, "btbl"), n_buckets=64)
        ).run_batch(spark, n_chunks=1)

    def q_replay_batch():
        shutil.rmtree(os.path.join(BENCH_TMP, "tbl"), ignore_errors=True)
        mk_job(
            ParquetSnapshotTable(spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64)
        ).run_batch(spark, n_chunks=2)

    def q_incremental():
        job = mk_job(
            ParquetSnapshotTable(spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64)
        )
        inc = gen_change_events(spark, max(1000, n_events // 100)).withColumn(
            "event_sequence", F.col("event_sequence") + 2 * n_events
        )
        job.apply_batch(inc, batch_id=100)

    def q_replay_stream():
        shutil.rmtree(os.path.join(BENCH_TMP, "stbl"), ignore_errors=True)
        shutil.rmtree(os.path.join(BENCH_TMP, "ckpt"), ignore_errors=True)
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "stbl"), n_buckets=64
        )
        job = (
            # mfpt=32 → 2 triggers over the 64-file log: the SAME commit
            # count as cdc_replay_batch's 2 chunks, so the pair is
            # like-for-like (round 4 — the r1-r3 value 16 ran 4 commits
            # against batch's 2; the measured decomposition in
            # BENCH/BASELINE.md shows the entire historical stream/batch
            # gap was commit count, not streaming overhead)
            IngestJob("bench-stream", max_files_per_trigger=32, watermark_delay="48 hours")
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        job.start_stream(spark, os.path.join(BENCH_TMP, "ckpt")).awaitTermination()

    def q_incremental_mor():
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64, write_mode="mor"
        )
        inc = gen_change_events(spark, max(1000, n_events // 100)).withColumn(
            "event_sequence", F.col("event_sequence") + 3 * n_events
        )
        mk_job(table).apply_batch(inc, batch_id=101)

    def q_patch_apply():
        # steady-state partial-image batch (operators/patch.py): 1%-sized
        # trickle where ~2/3 of U events are column patches, normalized
        # against the populated table (bucket-pruned baseline + narrow
        # carry-forward + rid late-materialization) then merged as usual
        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64
        )
        inc = gen_change_events(spark, max(1000, n_events // 100)).withColumn(
            "event_sequence", F.col("event_sequence") + 4 * n_events
        )
        sel = F.pmod(F.xxhash64(F.lit("p"), F.col("event_sequence")), F.lit(3))
        is_u = F.col("op") == "U"
        inc = inc.withColumn(
            "content",
            F.when(is_u & (sel == 0), F.lit(None).cast("string")).otherwise(F.col("content")),
        ).withColumn(
            "lang",
            F.when(is_u & (sel == 1), F.lit(None).cast("string")).otherwise(F.col("lang")),
        )
        job = (
            IngestJob("bench", patch=True)
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )
        job.apply_batch(inc, batch_id=102)

    from wprdc_etl_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures
    from wprdc_etl_spark.functions.similarity import cosine_near_dup_pairs
    from wprdc_etl_spark.functions.text import lang_id, quality_score

    # the driver tables are single parquet files → one input partition; the
    # per-row work (32-hash minhash, LSH banding, sign-bit projections) would
    # run on one core of 32. Sizing input partitions to the executor count is
    # the standard small-input fix (a real corpus has >> cores input splits).
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).repartition(CPUS)
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).repartition(CPUS)

    def q_doc_minhash_lsh():
        lsh_candidate_pairs(
            minhash_signatures(docs, n_hashes=32, shingle_k=5), n_bands=8
        ).count()

    def q_doc_quality_langid():
        docs.select(
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        ).select(F.count_distinct("lang_pred"), F.sum("quality")).collect()

    def q_emb_near_dup():
        cosine_near_dup_pairs(emb, dim=64, threshold=0.4).count()

    # (doc_dedup_clusters is deliberately NOT benched: on the driver's tiny
    # documents table the iterative CC loop measures pure per-round job
    # latency — ~34 s of fixed overhead, zero throughput signal — and would
    # only add spurious round-to-round noise. Its correctness gate is the
    # doc_dedup_clusters oracle.)

    def q_neardup_index_inc():
        # incremental-index path: index half the corpus, then probe the
        # other half against the persisted bucketed band table
        from wprdc_etl_spark.functions.neardup_index import NearDupIndex

        root = os.path.join(BENCH_TMP, "ndidx")
        shutil.rmtree(root, ignore_errors=True)
        idx = NearDupIndex(spark, root, n_hashes=32, shingle_k=5, n_bands=8,
                           n_buckets=16)
        idx.add(docs.where(F.col("doc_id") % 2 == 0), batch_id=0).count()
        idx.add(docs.where(F.col("doc_id") % 2 == 1), batch_id=1).count()

    def q_txn_gated_inc():
        # transaction-gated steady-state batch (operators/txn.py): the
        # same 1%-sized trickle stamped with 7-event source transactions,
        # gated to complete txns (one narrow (txn, seq) agg + broadcast
        # splits) before the ordinary merge
        from wprdc_etl_spark.operators.txn import gate_complete_txns, with_txn_metadata

        table = ParquetSnapshotTable(
            spark, os.path.join(BENCH_TMP, "tbl"), n_buckets=64
        )
        n_inc = max(1000, n_events // 100)
        inc = gen_change_events(spark, n_inc).withColumn(
            "event_sequence", F.col("event_sequence") + 5 * n_events
        )
        inc = with_txn_metadata(inc, txn_size=7, n_events=5 * n_events + n_inc)
        ready, _pending = gate_complete_txns(inc)
        mk_job(table).apply_batch(ready.drop("txn_id", "txn_total"), batch_id=103)

    def q_doc_boilerplate():
        # C4 boilerplate removal over the docs table with planted footers
        # (xxhash64 prod leaf): narrow count pass + broadcast anti join +
        # one doc-keyed rebuild
        from wprdc_etl_spark.functions.text import remove_boilerplate_lines

        planted = docs.select(
            "doc_id",
            F.concat(F.col("text"), F.lit("\nfooter "), F.col("source")).alias("text"),
        )
        remove_boilerplate_lines(planted, min_docs=3).select(
            F.sum("n_removed")
        ).collect()

    def q_doc_top_terms():
        from wprdc_etl_spark.functions.text import top_terms_per_doc

        top_terms_per_doc(docs, k=5, min_df=2).count()

    def q_doc_repeated_spans():
        # exact-substring repeated-span dedup: O(len) rolling-hash UDF →
        # narrow (id,pos,h) shuffle → text-verified → island merge
        from wprdc_etl_spark.functions.spans import repeated_spans

        repeated_spans(docs, window=30).select(F.sum("span_len")).collect()

    def q_doc_normalize_lm():
        # unicode NFC canonicalization (Arrow pandas UDF, one crossing) +
        # unigram-LM scoring (two hash aggs + broadcast dictionary join)
        from wprdc_etl_spark.functions.text import normalize_text, unigram_logprob

        normed = docs.select(
            "doc_id", normalize_text(F.col("text")).alias("text")
        )
        unigram_logprob(normed).select(F.sum("lm_score")).collect()

    plan = [
        ("dedup", q_dedup),
        ("latest_per_key", q_latest_per_key),
        ("fingerprint", q_fingerprint),
        ("cdc_bulk_load", q_bulk_load),
        ("cdc_replay_batch", q_replay_batch),
        ("cdc_incremental", q_incremental),
        ("cdc_replay_stream", q_replay_stream),
        ("cdc_incremental_mor", q_incremental_mor),
        ("cdc_patch_apply", q_patch_apply),
        ("cdc_txn_gated_inc", q_txn_gated_inc),
        ("doc_minhash_lsh", q_doc_minhash_lsh),
        ("doc_boilerplate", q_doc_boilerplate),
        ("doc_top_terms", q_doc_top_terms),
        ("doc_repeated_spans", q_doc_repeated_spans),
        ("doc_normalize_lm", q_doc_normalize_lm),
        ("doc_quality_langid", q_doc_quality_langid),
        ("emb_near_dup", q_emb_near_dup),
        ("neardup_index_inc", q_neardup_index_inc),
    ]

    # interleaved repetitions: a noise burst hits one rep of several queries,
    # never every rep of one query; min-per-query is the reported time
    rep_times: dict[str, list[float]] = {name: [] for name, _ in plan}

    def run_rep() -> None:
        for name, fn in plan:
            t0 = time.monotonic()
            fn()
            rep_times[name].append(round(time.monotonic() - t0, 3))

    for _rep in range(REPEATS):
        run_rep()

    # contention-adaptive extension: when interleaved reps of the SAME query
    # disagree by >2x (ignoring sub-second queries, where scheduler jitter
    # dominates), the whole window is contended — buy up to MAX_REPEATS
    # total chances at a quiet patch instead of publishing an unlucky
    # minimum (the seventh bench window measured 3-10x rep swings with an
    # in-window 6.6 GB/s triad probe; BENCH/BASELINE.md)
    def spread() -> float:
        ratios = [
            statistics.median(ts) / min(ts)
            for ts in rep_times.values()
            if ts and min(ts) > 0.5
        ]
        return max(ratios, default=1.0)

    while spread() > 2.0 and len(rep_times[plan[0][0]]) < MAX_REPEATS:
        run_rep()

    queries = {name: min(ts) for name, ts in rep_times.items()}
    total = round(sum(queries.values()), 3)

    # Self-document the hardware window: one STREAM-triad sweep set
    # (scripts/hwprobe.py methodology). Quiet-box reference is ~6+ GB/s
    # single-process; round-4 measured windows as low as 0.28 GB/s, which
    # inflates every wall clock above 2-5x — an artifact reader needs to
    # know which kind of window produced these numbers.
    try:
        import numpy as _np

        _a, _b = _np.ones(40_000_000), _np.full(40_000_000, 2.0)
        _c = _np.zeros(40_000_000)
        _t0 = time.monotonic()
        for _ in range(5):
            _np.add(_a, 1.5 * _b, out=_c)
        hw_triad_gbps = round(3 * 8 * 40_000_000 * 5 / (time.monotonic() - _t0) / 1e9, 2)
        del _a, _b, _c
    except Exception:
        hw_triad_gbps = None
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
                    "repeats": len(rep_times[plan[0][0]]),
                    "batch_events_per_sec": round(
                        total_events / queries["cdc_bulk_load"]
                    ),
                    "replay_events_per_sec": round(
                        total_events / queries["cdc_replay_batch"]
                    ),
                    "stream_events_per_sec": round(
                        total_events / queries["cdc_replay_stream"]
                    ),
                    "rep_times": rep_times,
                    "hw_triad_gbps": hw_triad_gbps,
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
