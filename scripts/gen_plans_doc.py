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

with open("/root/repo/docs/PLANS.md", "w") as fh:
    fh.write("# Physical plans of the hot paths (captured via explain('formatted'))\n\n")
    fh.write("Regenerate with `python scripts/gen_plans_doc.py` (this file is evidence\nthat pushdown/pruning/broadcast/partial-agg actually happen — SURVEY §5).\n")
    for title, note, plan in sections:
        fh.write(f"\n## {title}\n\n{note}\n\n```\n{plan}\n```\n")
print("wrote docs/PLANS.md")
spark.stop()
