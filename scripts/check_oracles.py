"""Local stand-in for the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry at sf0.01 and compare row-count + column
names + order-insensitive value multiset against oracle_sql() via DuckDB.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from wprdc_etl_spark.config import EngineConfig, build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return v


def main() -> int:
    spark = build_session(EngineConfig(master="local[8]", shuffle_partitions=8))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    only = sys.argv[1:] or None
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    # smoke entry() first (also materializes fixtures)
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"entry(): {n} rows, schema={edf.columns}")
    assert n > 0

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        sdf = fn(spark, SF_DIR)
        srows = [tuple(norm(v) for _, v in sorted(r.asDict().items())) for r in sdf.collect()]
        timings[name] = round(time.monotonic() - t0, 2)
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows={len(srows)} (rows-only, no oracle) t={timings[name]}s")
            continue
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        orows = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
        scols = sorted(sdf.columns)
        ocols = sorted(cols)
        ok_cols = scols == ocols
        ok_vals = Counter(srows) == Counter(orows)
        status = "OK " if (ok_cols and ok_vals) else "FAIL"
        print(f"{status} {name:28s} spark={len(srows)} duck={len(orows)} t={timings[name]}s cols={'=' if ok_cols else f'{scols} vs {ocols}'}")
        if not (ok_cols and ok_vals):
            failures += 1
            if not ok_vals:
                diff1 = list((Counter(srows) - Counter(orows)).items())[:3]
                diff2 = list((Counter(orows) - Counter(srows)).items())[:3]
                print(f"   spark-only: {diff1}")
                print(f"   duck-only:  {diff2}")
    con.close()
    spark.stop()
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    print("SLOWEST (spark-side secs):", json.dumps(dict(slow)))
    print("TOTAL_SPARK_SECS:", round(sum(timings.values()), 1))
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
