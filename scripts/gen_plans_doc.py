"""Capture explain('formatted') of the engine's hot paths into docs/PLANS.md."""
import sys, io, shutil, contextlib
sys.path.insert(0, '/root/repo')
from wprdc_etl_spark.config import EngineConfig, build_session
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.streaming.job import IngestJob
from wprdc_etl_spark.operators.latest import latest_per_key
from pyspark.sql import functions as F

spark = build_session(EngineConfig(master="local[8]", shuffle_partitions=8))
spark.sparkContext.setLogLevel("ERROR")
ev = spark.read.parquet("/root/repo/.fixtures/sf0.01/change_events")

def cap(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

sections = []
chunk = ev.where((F.col("event_sequence") >= 5000) & (F.col("event_sequence") < 10000)).select("repo","path","commit","event_sequence")
sections.append(("Sequence-range chunk scan (run_batch)",
  "Filters reach the parquet scan (`PushedFilters`) and only 4 of 8 columns are read (`ReadSchema`) — replay chunking costs file-skipping, not full scans.",
  cap(chunk)))

sections.append(("Last-writer-wins reduction (B4)",
  "`max_by(struct(payload), bigint_order)` — partial aggregate before the exchange (the `partial_max_by` under the first Aggregate) collapses multi-version keys map-side; only survivors shuffle.",
  cap(latest_per_key(ev))))

shutil.rmtree("/tmp/plandoc", ignore_errors=True)
t = ParquetSnapshotTable(spark, "/tmp/plandoc", n_buckets=8)
job = IngestJob("plan").source("/root/repo/.fixtures/sf0.01/change_events").schema(IngestJob.default_payload_schema()).sink(t).build()
job.run_batch(spark, n_chunks=1)
inc = ev.limit(100)
# capture the steady-state merge's materialization join via a small incremental batch:
from wprdc_etl_spark.schema import BaseSchema
sch = IngestJob.default_payload_schema()
valid, _ = sch.validate(inc)
valid = valid.where(~((F.col("op")!="D") & F.col("content").isNull())).withColumn("content_sha", F.sha2("content",256))
man = t._read_manifest()
import pyspark.sql.types as T
es = T.StructType.fromJson(man["schema"])
aligned = valid.select(*[F.col(f.name).cast(f.dataType).alias(f.name) for f in es.fields], F.col("event_sequence").cast("long").alias("_seq"), F.col("op").alias("_op"))
brows = aligned.withColumn("_rid", F.monotonically_increasing_id()*2+1)
bmeta = aligned.select("repo","path","commit","_seq","_op").withColumn("_rid", F.monotonically_increasing_id()*2+1)
from wprdc_etl_spark.plans.lake import _lww_reduce
bwin = _lww_reduce(bmeta, ["repo","path","commit"])
current = t._read_buckets(man, list(range(8)))
cmeta = current.select("repo","path","commit","_seq","_op").withColumn("_rid", F.monotonically_increasing_id()*2)
crows = current.withColumn("_rid", F.monotonically_increasing_id()*2)
fwin = _lww_reduce(bwin.unionByName(cmeta), ["repo","path","commit"])
merged = brows.unionByName(crows).join(F.broadcast(fwin.select("_rid")), "_rid")
sections.append(("Late-materialization merge, steady-state (B7)",
  "The narrow meta side (keys + _seq + _op + _rid) resolves winners; payload rows join the broadcast winning-rid set — payloads cross no exchange before the bucketed write. Note the scans: the meta branch reads a 5-column `ReadSchema`, the payload branch reads all columns exactly once.",
  cap(merged)))

from wprdc_etl_spark.operators.relational import asof_join, session_stats
evts = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
clicks = evts.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
purch = evts.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
sections.append(("As-of join (late-materialized union + carry-forward window)",
  "Only DISTINCT (key, ts) anchors and the dim payload enter the window exchange+sort (the Window's Input list has no event payload column — pinned by test_asof_join_payload_not_in_window_sort); event payload joins back by (key, ts) afterwards. No range-condition join, no per-event probe; both inputs are column-pruned scans with the event-type filter pushed down.",
  cap(asof_join(clicks, purch, on="user_id", ts="ts", dim_ts="ts", payload=["value"]))))

sections.append(("Sessionization (gaps-and-islands)",
  "lag + running sum + the session aggregate all run inside ONE exchange on the key: Catalyst stacks the two windows and the partial aggregate on the same hash partitioning (one Exchange node in the whole plan).",
  cap(session_stats(evts, key="user_id", ts="ts", gap_seconds=1800, value_col="value"))))

from wprdc_etl_spark.functions.similarity import cosine_near_dup_pairs
emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
sections.append(("Embedding near-dup (RP-LSH banded)",
  "The 32 hyperplane dots are codegen'd JVM expressions (no UDF); the self-join is keyed on (band, bucket) — shuffle O(rows×bands), never all-pairs; exact cosine verifies only surviving candidates.",
  cap(cosine_near_dup_pairs(emb, dim=64, threshold=0.4))))

from wprdc_etl_spark.operators.analytics import scd2_history, topk_per_group
sections.append(("Top-k per group (WindowGroupLimit)",
  "The row_number rank filter compiles to WindowGroupLimit on BOTH sides of the exchange (Partial before, Final after): every map task pre-prunes to its local top-5 per group, so the shuffle carries O(groups×k×partitions) rows — the distributed partial top-k.",
  cap(topk_per_group(evts, group=["event_type"], order_by=[F.col("value").desc(), F.col("event_id")], k=5))))

narrow = ev.select("repo","path","commit","event_sequence","op")
sections.append(("SCD Type-2 history (one window pass on the merge key)",
  "lead(seq) over (key ORDER BY seq, op) — a single exchange+sort on the merge's own key grain; the Window's Input list carries fingerprint-width metadata only (callers keep payload out by contract).",
  cap(scd2_history(narrow, keys=["repo","path","commit"], seq="event_sequence", op_col="op"))))

orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
nat = spark.read.parquet("/root/testdata/sf0.01/nation.parquet")
reg = spark.read.parquet("/root/testdata/sf0.01/region.parquet")
star = (orders.where((F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1997-01-01")))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name").agg(F.count("*").alias("n_orders"),
                               F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue")))
sections.append(("Star-schema join (broadcast dims + pushdown)",
  "Date and region filters reach the parquet scans (`PushedFilters`), every scan is column-pruned to exactly the join/agg columns, and the dims ride BroadcastHashJoins — the fact table is never shuffled for them.",
  cap(star)))

from wprdc_etl_spark.operators.relational import interval_join
clicks2 = evts.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
promos = evts.where(F.col("event_type") == "purchase").select(
    "user_id", F.col("ts").alias("s"), (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    F.col("value"))
sections.append(("Interval/range join (bucketed expansion)",
  "A raw `ts BETWEEN start AND end` join plans as BroadcastNestedLoopJoin (O(n×m)); the operator's bucketed rewrite shows only equi-joins here (SortMergeJoin/BroadcastHashJoin on (key, bucket)) with the range condition reduced to a post-join Filter — no NestedLoop node anywhere (pinned by test_interval_join_correct_and_no_nested_loop).",
  cap(interval_join(clicks2, promos, ts="ts", start="s", end="e", on="user_id",
                    payload=["value"], bucket_seconds=3600))))

from wprdc_etl_spark.plans.lake import diff_states
from wprdc_etl_spark.plans.replicate import TableReplicator
shutil.rmtree("/tmp/plandoc_rep", ignore_errors=True)
rep_t = ParquetSnapshotTable(spark, "/tmp/plandoc_rep", n_buckets=4)
rep = TableReplicator(t, rep_t, job="plan-rep")
rep.sync()
job.apply_batch(ev.limit(200), 1)
changes = t.changes_between(rep.cursor(), t.current_version(), compare_cols=["content_sha"])
batch = rep._materialize(changes, t.read())
sections.append(("Incremental replication sync (changelog diff + late-mat payload join)",
  "The version diff is ONE full-outer SortMergeJoin over (keys + content_sha) — every exchange on the diff side is narrow (no content column; pinned by test_incremental_sync_keeps_payload_out_of_diff_exchanges). Changed keys then join back to the target snapshot (`SHUFFLE_HASH` hint; AQE converts to broadcast when the change set is small), so content crosses exactly one exchange on its way into the replica's merge.",
  cap(batch)))

from wprdc_etl_spark.functions.neardup_index import NearDupIndex
docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
shutil.rmtree("/tmp/plandoc_idx", ignore_errors=True)
idx = NearDupIndex(spark, "/tmp/plandoc_idx", n_hashes=16, shingle_k=3, n_bands=4, n_buckets=8)
idx.add(docs.where(F.col("doc_id") % 2 == 0), batch_id=0)
probe = idx.add(docs.where(F.col("doc_id") % 2 == 1), batch_id=1)
sections.append(("Incremental near-dup probe (bucket-pruned index join)",
  "The batch's band rows join the PERSISTED index read from only the bucket dirs the batch's band hashes route to (driver-side pruning — the scan lists a subset of `_bucket_dir` paths, no filter on a full-table scan). Minhash/band expressions are codegen'd built-ins; the only collect in add() is the <=n_buckets bucket-id set.",
  cap(probe)))

del_batch = (t.read().where(F.col("lang") == "go").select("repo", "path", "commit")
             .withColumn("op", F.lit("D")).withColumn("event_sequence", F.lit(10**6).cast("long")))
sections.append(("Row-level DELETE WHERE (tombstone batch)",
  "delete_where's batch: the current state filtered by the predicate and projected to the key columns before entering the merge — `ReadSchema` on the scan carries only the keys, the predicate column (lang) and `_op`; `content`, the wide column, never enters the delete batch, so a compliance delete moves no payload bytes. The merge then rewrites only buckets holding matches.",
  cap(del_batch)))

from wprdc_etl_spark.operators.patch import normalize_patches
patch_batch = (ev.limit(300)
               .withColumn("content", F.when((F.col("op") == "U") &
                                             (F.pmod(F.xxhash64("event_sequence"), F.lit(2)) == 0),
                                             F.lit(None).cast("string")).otherwise(F.col("content"))))
sections.append(("Partial-image patch normalization (carry-forward on narrow metadata)",
  "normalize_patches: the carry-forward Window (last non-null setter rid per patch column) and the Sort feeding it list only keys + flags + rids in their Input — `content` appears solely in the per-column value joins ON `_rid` above the window (pinned by test_payload_not_in_carry_forward_window_sort). Baseline rows come from a driver-side bucket-pruned read.",
  cap(normalize_patches(t, patch_batch, patch_cols=("lang", "content")))))

from wprdc_etl_spark.operators.analytics import funnel
sections.append(("Funnel analysis (in-row walk after one user-keyed shuffle)",
  "Events filter to the step types at the scan (pushed In-filter on event_type), ONE hash-partitioned exchange on user_id feeds collect_list, and the greedy funnel walk is a codegen'd in-row aggregate over the sorted step list — no per-step joins, no second exchange beyond the distinct-users agg.",
  cap(funnel(evts, ["signup", "click", "purchase"]))))

from wprdc_etl_spark.functions.text import remove_boilerplate_lines, top_terms_per_doc
sections.append(("Boilerplate line removal (narrow count pass + broadcast anti join)",
  "Pass 1 aggregates leaf-HASHED lines (the groupBy exchange carries (hash, doc_id) — no line text); the over-threshold set rides a BroadcastHashJoin LeftAnti into pass 2; the only doc-keyed exchange carries surviving lines for the ordered rebuild.",
  cap(remove_boilerplate_lines(docs, min_docs=3))))

sections.append(("TF-IDF top terms (two narrow aggs + WindowGroupLimit)",
  "tf and df are hash aggregates over in-row-extracted terms (map-side partial; corpus text never shuffles); the dictionary join is AQE-eligible; the per-doc top-k compiles to WindowGroupLimit on both sides of its exchange.",
  cap(top_terms_per_doc(docs, k=5, n_docs=500, min_df=2))))

from wprdc_etl_spark.operators.analytics import gapfill_resample
sections.append(("Gap-filled resampling (in-row grid explode + one keyed join)",
  "The (key, window) agg and the per-key bounds agg are both map-side-combined hash aggregates over narrow rows; the gapless grid comes from an in-row sequence explode of the bounds (no global range, no driver loop), and the spine meets the aggregate in one keyed join — raw events never shuffle twice.",
  cap(gapfill_resample(evts, key="user_id", ts="ts", window_seconds=3600, value_col="value"))))

from wprdc_etl_spark.operators.codesearch import TrigramIndex
shutil.rmtree("/tmp/plandoc_tgi", ignore_errors=True)
tgi = TrigramIndex(spark, "/tmp/plandoc_tgi", t, n_buckets=8)
tgi.sync()
sections.append(("Trigram grep (pruned posting intersection + contains verify)",
  "The index scan lists only the literal's gram bucket dirs (driver-side pruning, like the near-dup probe); the AND-of-posting-lists is one narrow hash agg (map-side partial over ~50-byte posting rows); the surviving candidates BROADCAST into the source verify join, whose scan is itself pruned to the candidates' key buckets — the corpus is never scanned, and content bytes appear only in the final contains() filter.",
  cap(tgi.grep("a1b"))))

from wprdc_etl_spark.functions.dedup import lsh_candidate_pairs, minhash_signatures
sigs = minhash_signatures(docs, n_hashes=32, shingle_k=5)
sections.append(("MinHash-LSH candidate pairs (est-filter before the pair dedup)",
  "The band bucket-join's pair stream is deduped on a NARROW row: est_jaccard is computed in the join projection and the threshold filter sits BELOW HashAggregate(keys=[id_a, id_b, est]) — the dedup exchange shuffles ~20-byte (id, id, double) rows, never the two 32-long signature arrays (the round-4 fix that took the 300k-doc index build from 575 s to 48 s). The hot-bucket cap is the small count-agg + BroadcastHashJoin LeftAnti feeding both join sides.",
  cap(lsh_candidate_pairs(sigs, n_bands=8, est_threshold=0.5, max_bucket=2000))))

from wprdc_etl_spark.functions.text import (dup_line_char_frac, dup_line_frac,
                                            top_bigram_char_frac)
sections.append(("Gopher repetition metrics (in-row sort + run-length scan)",
  "All three rules compile to ONE whole-stage-codegen Project over the corpus scan — no exchange, no Python. Occurrence counting is array_sort + a run-length aggregate (struct accumulator) instead of a per-distinct-element filter sweep, making each rule O(n log n) per document in interpreted-HOF evals (the round-4 rewrite: 30.5 s -> 1.2 s on the oracle corpus).",
  cap(docs.select("doc_id",
                  dup_line_frac(F.col("text")).alias("dlf"),
                  dup_line_char_frac(F.col("text")).alias("dlcf"),
                  top_bigram_char_frac(F.col("text")).alias("tbcf")))))

with open("/root/repo/docs/PLANS.md", "w") as fh:
    fh.write("# Physical plans of the hot paths (captured via explain('formatted'))\n\n")
    fh.write("Regenerate with `python scripts/gen_plans_doc.py` (this file is evidence\nthat pushdown/pruning/broadcast/partial-agg actually happen — SURVEY §5).\n")
    for title, note, plan in sections:
        fh.write(f"\n## {title}\n\n{note}\n\n```\n{plan}\n```\n")
print("wrote docs/PLANS.md")
spark.stop()
