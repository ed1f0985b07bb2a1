"""Merge-on-read deltas (LSM-style write path) — write amplification bounded
by O(batch), read amplification bounded by inline compaction."""

import os

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from tests.test_lake_merge import EV_SCHEMA, SCHEMA, ev, state


def mk(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    kw.setdefault("write_mode", "mor")
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    return t


def test_mor_delta_append_leaves_base_untouched(spark, tmp_path):
    t = mk(spark, tmp_path, write_mode="auto", mor_batch_fraction=0.5)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(32)]
    t.merge(ev(spark, rows), job="j", batch_id=0)  # initial load → cow
    man0 = t._read_manifest()
    r = t.merge(ev(spark, [(100, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    assert r.strategy.startswith("mor-delta")
    man1 = t._read_manifest()
    # the affected bucket gained a delta; its base dir is untouched
    changed = [b for b in man0["buckets"] if man0["buckets"][b] != man1["buckets"][b]]
    assert len(changed) == 1
    b = changed[0]
    assert man1["buckets"][b][0] == man0["buckets"][b][0]  # base kept
    assert len(man1["buckets"][b]) == 2                     # + delta
    # read resolves the delta over the base
    assert state(t)[("r1", "p1", "c1")] == "new"
    assert len(state(t)) == 32


def test_mor_semantics_match_cow(spark, tmp_path):
    """The same batch sequence through MOR and COW converges to the same
    state (MOR is a physical layout choice, not a semantic one)."""
    batches = [
        [(0, "I", "r1", "a", "c1", "py", "v1"), (1, "I", "r2", "b", "c2", "go", "w1")],
        [(2, "U", "r1", "a", "c1", "py", "v2"), (3, "D", "r2", "b", "c2", "go", None)],
        [(1, "I", "r2", "b", "c2", "go", "w1")],  # stale redelivery after delete
        [(4, "I", "r3", "c", "c3", "rs", "z1")],
    ]
    t_mor = mk(spark, tmp_path / "mor", write_mode="mor")
    t_cow = mk(spark, tmp_path / "cow", write_mode="cow")
    for i, b in enumerate(batches):
        t_mor.merge(ev(spark, b), job="j", batch_id=i)
        t_cow.merge(ev(spark, b), job="j", batch_id=i)
    assert state(t_mor) == state(t_cow) == {
        ("r1", "a", "c1"): "v2",
        ("r3", "c", "c3"): "z1",
    }


def test_mor_inline_compaction_bounds_chain(spark, tmp_path):
    t = mk(spark, tmp_path, write_mode="mor", max_deltas=3, n_buckets=1)
    for i in range(8):
        t.merge(ev(spark, [(i, "I" if i == 0 else "U", "r", "p", "c", "py", f"v{i}")]),
                job="j", batch_id=i)
    man = t._read_manifest()
    chain = man["buckets"]["0"]
    assert len(chain) <= 4  # never exceeds max_deltas+1 for long
    assert any("compact" in d for d in chain) or len(chain) <= 3
    assert state(t) == {("r", "p", "c"): "v7"}


def test_mor_lookup_resolves_deltas(spark, tmp_path):
    t = mk(spark, tmp_path, write_mode="mor")
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "old")]), job="j", batch_id=0)
    t.merge(ev(spark, [(5, "U", "r", "p", "c", "py", "new")]), job="j", batch_id=1)
    got = t.lookup("r", "p").collect()
    assert len(got) == 1 and got[0]["content"] == "new"


def test_mor_schema_evolution(spark, tmp_path):
    t = mk(spark, tmp_path, write_mode="mor")
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0)
    evolved = ev(spark, [(1, "I", "r2", "p2", "c2", "go", "y")]).withColumn("license", F.lit("MIT"))
    t.merge(evolved, job="j", batch_id=1)
    got = {r["repo"]: r["license"] for r in t.read().collect()}
    assert got == {"r": None, "r2": "MIT"}


def test_mor_then_full_compact(spark, tmp_path):
    t = mk(spark, tmp_path, write_mode="mor")
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x"),
                       (1, "I", "r2", "p2", "c2", "go", "y")]), job="j", batch_id=0)
    t.merge(ev(spark, [(2, "D", "r", "p", "c", "py", None)]), job="j", batch_id=1)
    t.compact(drop_tombstones_below_seq=100)
    man = t._read_manifest()
    assert all(len(d) == 1 for d in man["buckets"].values())
    assert t._read_buckets(man).count() == 1  # tombstone GC'd
    assert state(t) == {("r2", "p2", "c2"): "y"}


def test_time_travel_into_mor_delta_version(spark, tmp_path):
    """read(version=) on a version whose buckets carried MOR delta chains
    must LWW-resolve exactly as that version's readers did (the history
    manifest stores the full base+delta dir lists)."""
    from tests.test_lake_merge import EV_SCHEMA

    def ev(rows):
        return spark.createDataFrame(rows, EV_SCHEMA)

    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4,
                             write_mode="cow", retain_history=8)
    t.ensure(spark.createDataFrame([], EV_SCHEMA).drop("event_sequence", "op").schema)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(16)]
    t.merge(ev(rows), job="j", batch_id=0)                       # v1 base
    t.write_mode = "mor"
    t.merge(ev([(100, "U", "r1", "p1", "c1", "py", "d1")]), job="j", batch_id=1)  # v2 delta
    t.merge(ev([(101, "U", "r2", "p2", "c2", "py", "d2")]), job="j", batch_id=2)  # v3 delta
    t.write_mode = "cow"
    t.merge(ev([(102, "U", "r3", "p3", "c3", "py", "d3")]), job="j", batch_id=3)  # v4

    def st(v=None):
        return {r["repo"]: r["content"] for r in t.read(version=v).collect()}

    s2 = st(2)
    assert s2["r1"] == "d1" and s2["r2"] == "v2" and len(s2) == 16
    s3 = st(3)
    assert s3["r1"] == "d1" and s3["r2"] == "d2" and s3["r3"] == "v3"
    assert st()["r3"] == "d3"


def test_mor_staggered_compaction_spreads_across_commits(spark, tmp_path):
    """Broad-touch CDC batches (every bucket touched every commit) must NOT
    compact every bucket in the same commit: uniform thresholds make all
    chains cross max_deltas together — a periodic full-table-rewrite stall
    (the 10^9 replay anchor died of exactly this). The cohort trigger
    (version % max_deltas == bucket % max_deltas once the chain exceeds 2)
    spreads compaction ~1/max_deltas of the buckets per commit, while the
    hard bound (chain <= max_deltas + 1) is unchanged."""
    t = mk(spark, tmp_path, write_mode="mor", max_deltas=4, n_buckets=4)
    keys = [(f"r{i}", f"p{i}", f"c{i}") for i in range(16)]
    chains = []
    for v in range(12):
        rows = [
            (v * 16 + i, "I" if v == 0 else "U", r, p, c, "py", f"v{v}")
            for i, (r, p, c) in enumerate(keys)
        ]
        t.merge(ev(spark, rows), job="j", batch_id=v)
        man = t._read_manifest()
        chains.append({b: len(d) for b, d in man["buckets"].items()})
    # hard bound holds at every version
    assert all(n <= 5 for ch in chains for n in ch.values())
    populated = len(chains[-1])
    assert populated >= 3  # 16 hashed keys spread over >=3 of the 4 buckets
    # a compaction resets a bucket's chain to the single compacted dir
    resets = [
        sum(1 for b in cur if cur[b] == 1 and prev.get(b, 0) >= 2)
        for prev, cur in zip(chains, chains[1:])
    ]
    steady = resets[5:]
    assert any(r > 0 for r in steady)          # compaction does happen
    assert max(steady) < populated             # ...but never all at once
    assert state(t) == {k: "v11" for k in keys}


def test_bucket_rows_exact_under_cow_updates(spark, tmp_path):
    """COW replaces each bucket's whole chain, so bucket_rows must equal the
    rewritten dirs' physical rows — update-heavy batches must not inflate
    it (the accumulate-only estimate once doubled a table's count and
    flipped the 'auto' policy to MOR on a false table-size signal)."""
    t = mk(spark, tmp_path, write_mode="cow")
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", "x") for i in range(20)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    t.merge(
        ev(spark, [(100 + i, "U", f"r{i}", f"p{i}", f"c{i}", "py", "y") for i in range(20)]),
        job="j", batch_id=1,
    )
    man = t._read_manifest()
    assert sum(int(n) for n in man["bucket_rows"].values()) == 20
    assert t.read().count() == 20


def test_bucket_rows_track_physical_rows_under_mor(spark, tmp_path):
    """Under MOR, bucket_rows must equal the chain's physical parquet rows
    (deltas add exact increments; inline compaction resets to the resolved
    count) — it is the auto policy's and the compaction sizer's input."""
    import glob

    import pyarrow.parquet as pq

    t = mk(spark, tmp_path, write_mode="mor", max_deltas=2, n_buckets=1)
    for v in range(6):
        t.merge(
            ev(spark, [(v, "I" if v == 0 else "U", "r", "p", "c", "py", f"v{v}")]),
            job="j", batch_id=v,
        )
    man = t._read_manifest()
    phys = 0
    for rel in man["buckets"]["0"]:
        for f in glob.glob(os.path.join(str(tmp_path / "tbl"), rel, "*.parquet")):
            phys += pq.ParquetFile(f).metadata.num_rows
    assert sum(int(n) for n in man["bucket_rows"].values()) == phys
