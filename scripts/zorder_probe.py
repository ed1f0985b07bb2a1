"""Measure what compact(zorder_by=) actually buys at read time.

Builds the same table twice from the bench event log — once compacted
lexicographically by (repo, lang) via ``cluster_within_buckets``, once
z-ordered by the same columns — then, for a selective single-column
predicate on the TRAILING column (``lang = 'py'``: the case lexicographic
clustering cannot serve, because lang cycles its full range inside every
multi-repo run), reports per layout:

- row groups whose parquet min/max stats ADMIT the predicate (what the
  reader must scan) vs total row groups — from the file footers, so the
  number is deterministic, not a timing;
- best-of-3 wall time of the filtered aggregate on a cold session scan.

Prints one JSON line. Uses few buckets so each file carries several row
groups at the default 128 MB block size — the shape a 100-TB table's
files actually have.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wprdc_etl_spark.config import EngineConfig, build_session  # noqa: E402
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable  # noqa: E402
from wprdc_etl_spark.streaming.job import IngestJob  # noqa: E402
from wprdc_etl_spark.testgen import gen_change_events, write_event_log  # noqa: E402

N_EVENTS = int(os.environ.get("ZPROBE_EVENTS", "2000000"))
N_BUCKETS = 2  # few, fat files -> several row groups each
PRED_COL, PRED_VAL = "lang", "py"


def build(spark, root: str, log_dir: str, *, zorder: bool) -> ParquetSnapshotTable:
    shutil.rmtree(root, ignore_errors=True)
    kw = {} if zorder else {"cluster_within_buckets": ["repo", "lang"]}
    table = ParquetSnapshotTable(spark, root, n_buckets=N_BUCKETS, **kw)
    job = (
        IngestJob(f"zprobe-{'z' if zorder else 'lex'}")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.run_batch(spark)
    if zorder:
        table.compact(zorder_by=["repo", "lang"])
    else:
        table.compact()
    return table


def admitted_row_groups(table) -> tuple[int, int]:
    """(row groups whose stats admit lang == 'py', total row groups)."""
    admit = total = 0
    man = table._require_manifest()
    for b in man["buckets"]:
        for rel in table._dirs_of(man, b):
            d = os.path.join(table.root, rel)
            for name in os.listdir(d):
                if not name.endswith(".parquet"):
                    continue
                md = pq.ParquetFile(os.path.join(d, name)).metadata
                idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[
                    PRED_COL
                ]
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    total += 1
                    if st is None or st.min is None:
                        admit += 1
                    elif st.min <= PRED_VAL <= st.max:
                        admit += 1
    return admit, total


def timed_scan(spark, table) -> float:
    best = float("inf")
    for _ in range(3):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        (
            table.read()
            .where(F.col(PRED_COL) == PRED_VAL)
            .agg(F.count("*"), F.sum(F.length("content")))
            .collect()
        )
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def main() -> None:
    spark = build_session(EngineConfig(master="local[32]"))
    # 16 MB row groups: a fat 100-TB-table file carries dozens of row
    # groups; the probe's ~0.5 GB per bucket would otherwise yield only ~2
    # each and quantize the skip ratio. Applied to BOTH layouts equally.
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "parquet.block.size", str(16 * 1024 * 1024)
    )
    log_dir = os.path.join(REPO, ".fixtures", "bench", f"events_{N_EVENTS}")
    if not os.path.exists(os.path.join(log_dir, "_SUCCESS")):
        write_event_log(gen_change_events(spark, N_EVENTS), log_dir, n_files=32)
    base = os.path.join(REPO, ".bench_tmp", "zprobe")
    out = {}
    for label, z in (("lex", False), ("zorder", True)):
        t = build(spark, os.path.join(base, label), log_dir, zorder=z)
        admit, total = admitted_row_groups(t)
        out[label] = {
            "row_groups_admitted": admit,
            "row_groups_total": total,
            "scan_sec_best3": timed_scan(spark, t),
        }
    lex, zo = out["lex"], out["zorder"]
    out["skip_ratio_zorder"] = round(
        1 - zo["row_groups_admitted"] / max(1, zo["row_groups_total"]), 3
    )
    out["skip_ratio_lex"] = round(
        1 - lex["row_groups_admitted"] / max(1, lex["row_groups_total"]), 3
    )
    print(json.dumps({"probe": "zorder_skipping", "n_events": N_EVENTS,
                      "predicate": f"{PRED_COL} = '{PRED_VAL}'", **out}))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
