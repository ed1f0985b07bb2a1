"""ParquetSnapshotTable — keyed MERGE semantics (SURVEY B7/B8/B9/B10),
the engine analog of the reference's test_loaders upsert tests
(``pipeline/loaders.py::CKANDatastoreLoader``, SURVEY §6.1)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import DuplicateBatchException, SinkCommitError
from wprdc_etl_spark.plans.lake import LineageCounts, ParquetSnapshotTable

COLS = ["event_sequence", "op", "repo", "path", "commit", "lang", "content"]

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def mk_table(spark, tmp, **kw):
    kw.setdefault("n_buckets", 4)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    return t


EV_SCHEMA = T.StructType(
    [T.StructField("event_sequence", T.LongType()), T.StructField("op", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)


def ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def state(t):
    return {
        (r["repo"], r["path"], r["commit"]): r["content"] for r in t.read().collect()
    }


def test_create_exists_read_empty(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    assert t.exists()
    assert t.read().count() == 0
    assert t.read().columns == ["repo", "path", "commit", "lang", "content"]


def test_ensure_requires_key_columns(spark, tmp_path):
    t = ParquetSnapshotTable(spark, str(tmp_path / "bad"))
    with pytest.raises(SinkCommitError):
        t.ensure(T.StructType([T.StructField("x", T.StringType())]))


def test_insert_update_delete(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [
        (0, "I", "r1", "a", "c1", "py", "v1"),
        (1, "I", "r2", "b", "c2", "go", "w1"),
    ]), job="j", batch_id=0)
    assert state(t) == {("r1", "a", "c1"): "v1", ("r2", "b", "c2"): "w1"}

    t.merge(ev(spark, [
        (2, "U", "r1", "a", "c1", "py", "v2"),     # update existing key
        (3, "D", "r2", "b", "c2", "go", None),     # delete existing key
        (4, "I", "r3", "c", "c3", "rs", "z1"),     # insert new key
    ]), job="j", batch_id=1)
    assert state(t) == {("r1", "a", "c1"): "v2", ("r3", "c", "c3"): "z1"}


def test_lww_within_batch_and_against_table(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(5, "I", "r", "p", "c", "py", "new")]), job="j", batch_id=0)
    # stale event (seq 2) for the same key must NOT regress the row
    r = t.merge(ev(spark, [(2, "U", "r", "p", "c", "py", "old")]), job="j", batch_id=1)
    assert r.applied
    assert state(t) == {("r", "p", "c"): "new"}


def test_delete_tombstone_blocks_stale_resurrection(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(1, "I", "r", "p", "c", "py", "x"), (9, "D", "r", "p", "c", "py", None)]),
            job="j", batch_id=0)
    assert state(t) == {}
    # redelivered old insert (seq 1) after the delete (seq 9): stays deleted
    t.merge(ev(spark, [(1, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=1)
    assert state(t) == {}


def test_delete_of_nonexistent_key_is_noop(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    r = t.merge(ev(spark, [(0, "D", "ghost", "p", "c", "py", None)]), job="j", batch_id=0)
    assert r.applied and state(t) == {}


def test_exactly_once_guard(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    df = ev(spark, [(0, "I", "r", "p", "c", "py", "x")])
    assert t.merge(df, job="j", batch_id=0).applied
    skip = t.merge(ev(spark, [(99, "U", "r", "p", "c", "py", "EVIL")]), job="j", batch_id=0)
    assert not skip.applied and "last_committed" in skip.skipped_reason
    assert state(t) == {("r", "p", "c"): "x"}
    assert t.last_committed_batch("j") == 0
    # other jobs are independent
    assert t.last_committed_batch("other") is None


def test_strict_duplicate_raises(spark, tmp_path):
    """Descendant of the reference's DuplicateFileException (SURVEY A25)."""
    t = mk_table(spark, tmp_path, strict_duplicate_check=True)
    df = ev(spark, [(0, "I", "r", "p", "c", "py", "x")])
    t.merge(df, job="j", batch_id=0)
    with pytest.raises(DuplicateBatchException):
        t.merge(df, job="j", batch_id=0)


@pytest.mark.parametrize("strategy", ["broadcast", "copart", "shuffle"])
def test_strategies_agree(spark, tmp_path, strategy):
    t = mk_table(spark, tmp_path / strategy, merge_strategy=strategy)
    t.merge(ev(spark, [
        (0, "I", "r1", "a", "c1", "py", "v1"),
        (1, "I", "r2", "b", "c2", "go", "w1"),
        (2, "D", "r1", "a", "c1", "py", None),
        (3, "U", "r2", "b", "c2", "go", "w2"),
    ]), job="j", batch_id=0)
    assert state(t) == {("r2", "b", "c2"): "w2"}
    r = t.merge(ev(spark, [(4, "U", "r2", "b", "c2", "go", "w3")]), job="j", batch_id=1)
    assert r.strategy.endswith(strategy)
    assert state(t) == {("r2", "b", "c2"): "w3"}


def test_anti_strategy_agrees(spark, tmp_path):
    t = mk_table(spark, tmp_path, merge_strategy="anti")
    t.merge(ev(spark, [
        (0, "I", "r1", "a", "c1", "py", "v1"),
        (0, "I", "r1", "a", "c1", "py", "v1"),   # redelivery
        (1, "I", "r2", "b", "c2", "go", "w1"),
    ]), job="j", batch_id=0)
    r = t.merge(ev(spark, [
        (2, "D", "r1", "a", "c1", "py", None),
        (3, "U", "r2", "b", "c2", "go", "w2"),
    ]), job="j", batch_id=1)
    assert "anti" in r.strategy
    assert state(t) == {("r2", "b", "c2"): "w2"}


def test_only_affected_buckets_rewritten(spark, tmp_path):
    t = mk_table(spark, tmp_path, n_buckets=8)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(64)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    man0 = t._read_manifest()
    r = t.merge(ev(spark, [(100, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    man1 = t._read_manifest()
    assert r.n_affected_buckets == 1
    changed = [b for b in man0["buckets"] if man0["buckets"][b] != man1["buckets"][b]]
    assert len(changed) == 1  # 7 of 8 bucket dirs untouched (copy-on-write)
    assert state(t)[("r1", "p1", "c1")] == "new"


def test_schema_evolution_additive(spark, tmp_path):
    """B9: new nullable column appears → added; old rows read as null."""
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0)
    evolved = ev(spark, [(1, "I", "r2", "p2", "c2", "go", "y")]).withColumn(
        "license", F.lit("MIT")
    )
    t.merge(evolved, job="j", batch_id=1)
    got = {r["repo"]: r["license"] for r in t.read().collect()}
    assert got == {"r": None, "r2": "MIT"}
    assert "license" in [f.name for f in t.schema().fields]
    # next batch without the column still works (null-filled)
    t.merge(ev(spark, [(2, "I", "r3", "p3", "c3", "js", "z")]), job="j", batch_id=2)
    assert state(t).keys() == {("r", "p", "c"), ("r2", "p2", "c2"), ("r3", "p3", "c3")}


def test_lineage_rows(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    t.merge(
        ev(spark, [(0, "I", "r", "p", "c", "py", "x"), (1, "D", "r9", "p9", "c9", "py", None)]),
        job="j",
        batch_id=0,
        counts=LineageCounts(rows_quarantined=3, rows_late=1, input_hash="h123", wall_ms=42),
    )
    lin = t.read_lineage()
    summary = lin.where(F.col("partition") == -1).collect()[0]
    assert summary["rows_upserted"] == 1 and summary["rows_deleted"] == 1
    assert summary["rows_quarantined"] == 3 and summary["rows_late"] == 1
    assert summary["input_hash"] == "h123" and summary["status"] == "success"
    per_bucket = lin.where(F.col("partition") >= 0)
    assert per_bucket.count() >= 1
    assert per_bucket.agg(F.max("last_seq")).collect()[0][0] == 1


def test_truncate_full_refresh(spark, tmp_path):
    """A20 parity: method='insert' full refresh drops data + guard state."""
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0)
    t.truncate()
    assert t.read().count() == 0
    assert t.last_committed_batch("j") is None
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "y")]), job="j", batch_id=0)
    assert state(t) == {("r", "p", "c"): "y"}


def test_empty_batch_advances_guard(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    r = t.merge(ev(spark, []), job="j", batch_id=5)
    assert r.applied and t.last_committed_batch("j") == 5


def test_compact_gc_tombstones(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x"), (1, "D", "r", "p", "c", "py", None)]),
            job="j", batch_id=0)
    raw = t._read_buckets(t._read_manifest())
    assert raw.count() == 1  # the tombstone
    t.compact(drop_tombstones_below_seq=10)
    assert t._read_buckets(t._read_manifest()).count() == 0
    assert t.read().count() == 0


def test_lookup_bucket_pruned(spark, tmp_path):
    t = mk_table(spark, tmp_path, n_buckets=8)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(32)]
    rows.append((99, "D", "r5", "p5", "c5", "py", None))
    t.merge(ev(spark, rows), job="j", batch_id=0)
    got = t.lookup("r3", "p3").collect()
    assert len(got) == 1 and got[0]["content"] == "v3"
    assert t.lookup("r5", "p5").count() == 0       # deleted key invisible
    assert t.lookup("ghost", "nope").count() == 0  # absent key
    assert t.lookup("r3", "p3", commit="c3").count() == 1


def test_properties_touch(spark, tmp_path):
    """A23 parity: update_metadata → manifest properties."""
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0,
            properties={"last_modified_by": "job-j"})
    assert t.properties()["last_modified_by"] == "job-j"


# ---- round-2 hardening: rid pinning, strategy validation, custom keys ------


def _formatted_plan(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_rid_unsafe_detection(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    src = str(tmp_path / "src")
    ev(spark, [(0, "I", "r", "p", "c", "py", "x")]).write.parquet(src)
    scan = spark.read.parquet(src)
    assert not ParquetSnapshotTable._rid_unsafe(scan)
    assert not ParquetSnapshotTable._rid_unsafe(scan.where(F.col("op") == "I"))
    assert ParquetSnapshotTable._rid_unsafe(scan.repartition(4))
    assert ParquetSnapshotTable._rid_unsafe(
        scan.groupBy("repo").agg(F.max("event_sequence"))
    )
    assert ParquetSnapshotTable._rid_unsafe(scan.dropDuplicates(["repo", "path"]))


@pytest.mark.parametrize("shaper", ["repartition", "aggregate", "sort"])
def test_merge_correct_on_shuffled_batch(spark, tmp_path, shaper):
    """A batch whose plan carries a shuffle (non-deterministic row order
    across actions) must still merge correctly — the pin guard materializes
    one rid assignment instead of silently correlating divergent ids."""
    t = mk_table(spark, tmp_path)
    rows = [(i, "I", f"r{i % 7}", f"p{i}", "c", "py", f"v{i}") for i in range(200)]
    rows += [(1000 + i, "U", f"r{i % 7}", f"p{i}", "c", "py", f"new{i}") for i in range(0, 200, 3)]
    src = str(tmp_path / f"src_{shaper}")
    ev(spark, rows).write.parquet(src)
    batch = spark.read.parquet(src)
    if shaper == "repartition":
        batch = batch.repartition(16)
    elif shaper == "aggregate":
        batch = batch.groupBy("repo", "path", "commit", "event_sequence", "op").agg(
            F.first("lang").alias("lang"), F.first("content").alias("content")
        )
    else:
        batch = batch.sortWithinPartitions("content").repartition(8, "repo")
    t.merge(batch, job="j", batch_id=0)
    got = state(t)
    assert len(got) == 200
    for i in range(200):
        expect = f"new{i}" if i % 3 == 0 else f"v{i}"
        assert got[(f"r{i % 7}", f"p{i}", "c")] == expect


def test_invalid_merge_strategy_rejected(spark, tmp_path):
    with pytest.raises(SinkCommitError):
        ParquetSnapshotTable(spark, str(tmp_path / "x"), merge_strategy="bogus")


def test_custom_keys_and_bucket_keys(spark, tmp_path):
    """Non-default primary key: bucketing/lookup derive from the table's own
    keys instead of hardcoded (repo, path)."""
    schema = T.StructType(
        [T.StructField("user_id", T.StringType()), T.StructField("balance", T.StringType())]
    )
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), keys=["user_id"], n_buckets=4)
    t.ensure(schema)
    evs = spark.createDataFrame(
        [(0, "I", "u1", "10"), (1, "I", "u2", "20"), (2, "U", "u1", "15")],
        T.StructType(
            [T.StructField("event_sequence", T.LongType()), T.StructField("op", T.StringType()),
             T.StructField("user_id", T.StringType()), T.StructField("balance", T.StringType())]
        ),
    )
    t.merge(evs, job="j", batch_id=0)
    got = {r["user_id"]: r["balance"] for r in t.read().collect()}
    assert got == {"u1": "15", "u2": "20"}
    hit = t.lookup(user_id="u1").collect()
    assert len(hit) == 1 and hit[0]["balance"] == "15"
    with pytest.raises(SinkCommitError):
        t.lookup()  # bucket key value missing


def test_bucket_keys_must_be_subset_of_keys(spark, tmp_path):
    with pytest.raises(SinkCommitError):
        ParquetSnapshotTable(spark, str(tmp_path / "x"), keys=["a"], bucket_keys=["b"])


def test_mor_read_plan_prunes_clean_buckets_and_payload(spark, tmp_path):
    """With 1 of N buckets carrying a delta, read() must (a) union the clean
    buckets around the LWW instead of reducing everything, and (b) keep the
    payload column out of every exchange (late materialization)."""
    t = mk_table(spark, tmp_path, n_buckets=8, write_mode="cow")
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(64)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    t.write_mode = "mor"
    t.merge(ev(spark, [(100, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    man = t._read_manifest()
    n_delta = sum(1 for b in man["buckets"] if len(t._dirs_of(man, b)) > 1)
    assert n_delta == 1
    plan = _formatted_plan(t.read())
    # (b): no Exchange carries the payload column
    import re
    for m in re.finditer(r"\(\d+\) (\w*Exchange\w*)[^\n]*\n((?:[A-Za-z][^\n]*\n)*)", plan):
        assert "content#" not in m.group(2), f"payload crossed {m.group(1)}:\n{m.group(2)}"
    # (a): correctness — every row present, the delta resolved
    got = state(t)
    assert len(got) == 64 and got[("r1", "p1", "c1")] == "new"


def test_time_travel_read_and_history(spark, tmp_path):
    """Every commit writes an immutable history manifest; read(version=N)
    reproduces the exact post-commit-N state while data files are retained,
    and history() lists the commit log."""
    t = mk_table(spark, tmp_path, retain_history=8)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1")]), job="j", batch_id=0)
    t.merge(ev(spark, [(1, "U", "r1", "a", "c1", "py", "v2"),
                       (2, "I", "r2", "b", "c2", "go", "w1")]), job="j", batch_id=1)
    t.merge(ev(spark, [(3, "D", "r2", "b", "c2", "go", None)]), job="j", batch_id=2)

    def st(v):
        return {(r["repo"], r["path"], r["commit"]): r["content"]
                for r in t.read(version=v).collect()}

    assert st(1) == {("r1", "a", "c1"): "v1"}
    assert st(2) == {("r1", "a", "c1"): "v2", ("r2", "b", "c2"): "w1"}
    assert st(3) == state(t) == {("r1", "a", "c1"): "v2"}
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1, 2, 3]
    assert hist[-1]["is_current"] and all(h["readable"] for h in hist)
    assert hist[2]["committed"] == {"j": 1}
    # beyond-head versions are rejected outright (never served from an
    # orphan pre-swap history snapshot a crashed commit may have left)
    with pytest.raises(SinkCommitError, match="does not exist"):
        t.read(version=99)


def test_time_travel_expiration_gc(spark, tmp_path):
    """retain_history=1: only the previous version's files survive GC —
    older versions raise a clear expiration error, current + N-1 still read."""
    t = mk_table(spark, tmp_path, retain_history=1, write_mode="cow")
    for i in range(4):
        t.merge(ev(spark, [(i, "U", "r1", "a", "c1", "py", f"v{i}")]),
                job="j", batch_id=i)
    # v3 (N-1) retained; v2 and older expired (COW rewrote the only bucket)
    assert [r["content"] for r in t.read(version=3).collect()] == ["v2"]
    assert [r["content"] for r in t.read().collect()] == ["v3"]
    with pytest.raises(SinkCommitError, match="expired"):
        t.read(version=2)
    hist = {h["version"]: h["readable"] for h in t.history()}
    assert hist[3] and hist[4] and not hist[2]


def test_retain_history_zero_unchanged(spark, tmp_path):
    """Default retention keeps today's GC behavior: past data files die with
    the commit that superseded them (history manifests remain as audit)."""
    t = mk_table(spark, tmp_path, write_mode="cow")
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1")]), job="j", batch_id=0)
    t.merge(ev(spark, [(1, "U", "r1", "a", "c1", "py", "v2")]), job="j", batch_id=1)
    with pytest.raises(SinkCommitError, match="expired"):
        t.read(version=1)
    assert [h["version"] for h in t.history()] == [0, 1, 2]


def test_expire_snapshots(spark, tmp_path):
    """expire_snapshots(keep) drops old history manifests + GCs their files;
    retained versions still time-travel."""
    t = mk_table(spark, tmp_path, retain_history=8, write_mode="cow")
    for i in range(5):
        t.merge(ev(spark, [(i, "U", "r1", "a", "c1", "py", f"v{i}")]),
                job="j", batch_id=i)
    assert [h["version"] for h in t.history()] == [0, 1, 2, 3, 4, 5]
    removed = t.expire_snapshots(keep=1)
    assert removed == 4  # v0..v3 expired; v4 (N-1) and v5 (current) remain
    assert [h["version"] for h in t.history()] == [4, 5]
    assert [r["content"] for r in t.read(version=4).collect()] == ["v3"]
    with pytest.raises(SinkCommitError, match="no history snapshot"):
        t.read(version=3)
    # expired data dirs are gone from disk
    import os
    live = {d for d in os.listdir(str(tmp_path / "tbl" / "data"))}
    # attempt dirs carry a per-writer token suffix: compare version prefixes
    assert {d.split("_")[0] for d in live if not d.startswith(".")} == {"v4", "v5"}


def test_expire_snapshots_keep_wider_than_retention(spark, tmp_path):
    """keep > retain_history must not GC the data dirs of versions inside
    the requested keep window (ADVICE r2: _gc_orphans used retain_history,
    orphaning versions the caller asked to keep). Scenario: the writer
    retained 8 versions; a maintenance handle with retain_history=1 runs
    expire(keep=3) — versions 2..4 must stay readable."""
    t = mk_table(spark, tmp_path, retain_history=8, write_mode="cow")
    for i in range(5):
        t.merge(ev(spark, [(i, "U", "r1", "a", "c1", "py", f"v{i}")]),
                job="j", batch_id=i)
    maint = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), retain_history=1)
    removed = maint.expire_snapshots(keep=3)
    assert removed == 2  # v0, v1 expired; v2..v5 kept
    assert [h["version"] for h in t.history()] == [2, 3, 4, 5]
    # every version in the keep window still time-travels — readable data
    for v, want in [(2, "v1"), (3, "v2"), (4, "v3")]:
        assert [r["content"] for r in t.read(version=v).collect()] == [want]


def test_concurrent_writer_cas(spark, tmp_path):
    """Two writers interleaving commits on one table: the second to commit
    from a stale manifest read must fail with a clean SinkCommitError (not
    silently last-write-wins away the other's bucket updates), and the
    table must stay consistent with the surviving commit."""
    t = mk_table(spark, tmp_path)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v0")]), job="j", batch_id=0)

    # writer B commits between writer A's manifest read and A's swap:
    # simulate by snapshotting the manifest A read, letting B commit, then
    # restoring A's stale base so A's merge derives version from it
    import json as _json

    stale = _json.load(open(t._manifest_path))
    t2 = ParquetSnapshotTable(spark, str(tmp_path / "tbl"))
    t2.merge(ev(spark, [(1, "U", "r2", "b", "c2", "py", "B")]), job="other", batch_id=0)
    fresh = _json.load(open(t._manifest_path))
    assert fresh["version"] == stale["version"] + 1

    # A now swaps a manifest derived from the stale base → CAS must refuse
    stale_next = dict(stale)
    stale_next["version"] = stale["version"] + 1  # collides with B's commit
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        t._swap_manifest(stale_next)

    # table state: B's commit intact, A's refused commit invisible
    assert state(t2) == {
        ("r1", "a", "c1"): "v0",
        ("r2", "b", "c2"): "B",
    }
    # a lock left behind by a crashed writer is broken after the stale age
    lock = str(tmp_path / "tbl" / ".manifest.lock")
    open(lock, "w").write("9999\n")
    import os as _os
    old = __import__("time").time() - 120
    _os.utime(lock, (old, old))
    t2.merge(ev(spark, [(2, "U", "r1", "a", "c1", "py", "v1")]), job="j", batch_id=1)
    assert state(t2)[("r1", "a", "c1")] == "v1"
    # fresh lock held by a live writer → the late committer times out cleanly
    open(lock, "w").write("9999\n")
    t3 = ParquetSnapshotTable(spark, str(tmp_path / "tbl"))
    t3._LOCK_TIMEOUT_S = 0.3
    with pytest.raises(SinkCommitError, match="commit lock"):
        t3.merge(ev(spark, [(3, "U", "r9", "z", "c9", "py", "x")]), job="j", batch_id=2)
    _os.remove(lock)


def test_copart_bulk_replay_matches_broadcast(spark, tmp_path):
    """The copart bulk path (winner-rid semi join riding the write exchange)
    produces the exact final state of the reference broadcast path on a
    multi-version log with redeliveries, deletes and an existing table."""
    rows1 = [(i, "I", f"r{i%7}", f"p{i%13}", f"c{i}", "py", f"v{i}") for i in range(200)]
    rows2 = (
        [(200 + i, "U", f"r{i%7}", f"p{i%13}", f"c{i}", "py", f"w{i}") for i in range(150)]
        + [(400 + i, "D", f"r{i%7}", f"p{i%13}", f"c{i}", "py", None) for i in range(40)]
        + [(200, "U", "r0", "p0", "c0", "py", "w0")]  # redelivery
    )
    states = {}
    for strat in ("broadcast", "copart"):
        t = mk_table(spark, tmp_path / strat, n_buckets=8, merge_strategy=strat)
        t.merge(ev(spark, rows1), job="j", batch_id=0)
        r = t.merge(ev(spark, rows2), job="j", batch_id=1)
        assert r.strategy.endswith(strat)
        states[strat] = state(t)
    assert states["copart"] == states["broadcast"]
    assert len(states["copart"]) == 200 - 40


def test_copart_single_payload_exchange(spark, tmp_path):
    """copart plan shape: payload bytes cross EXACTLY ONE exchange (the
    write's bucketed repartition, which the semi join rides); the rid side
    shuffles narrow columns only and no BroadcastExchange exists."""
    import re

    t = mk_table(spark, tmp_path, n_buckets=8, merge_strategy="copart")
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(32)]
    # reproduce the merge's join shape on a raw plan (merge() executes
    # eagerly, so assert on an equivalent composed plan)
    from wprdc_etl_spark.plans.lake import _lww_reduce, bucket_of

    df = ev(spark, rows).withColumnRenamed("event_sequence", "_seq").withColumnRenamed("op", "_op")
    meta = df.select("repo", "path", "commit", "_seq", "_op").withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    wide = df.withColumn("_rid", F.monotonically_increasing_id()).withColumn(
        "_bucket_dir", bucket_of(8, ["repo", "path"])
    )
    fwin = _lww_reduce(meta, ["repo", "path", "commit"])
    rids = fwin.select(bucket_of(8, ["repo", "path"]).alias("_bucket_dir"), "_rid")
    merged = wide.join(
        rids.hint("SHUFFLE_HASH"), ["_bucket_dir", "_rid"], "left_semi"
    ).drop("_rid")
    plan = _formatted_plan(merged)
    assert "BroadcastExchange" not in plan
    content_exchanges = 0
    for m in re.finditer(r"\(\d+\) (\w*Exchange\w*)[^\n]*\n((?:[A-Za-z][^\n]*\n)*)", plan):
        if "content#" in m.group(2):
            content_exchanges += 1
    assert content_exchanges == 1, plan
    # correctness of the composed plan itself
    assert merged.count() == 32


def test_rebucket_layout_evolution(spark, tmp_path):
    """rebucket(): state preserved, manifest n_buckets switches, subsequent
    merges and point lookups use the new layout, and time travel reads old
    versions under their OWN old layout."""
    t = mk_table(spark, tmp_path, n_buckets=4, retain_history=8)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(40)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    before = state(t)
    v = t.rebucket(16)
    man = t._read_manifest()
    assert man["n_buckets"] == 16 and man["version"] == v
    assert state(t) == before
    assert len(man["buckets"]) > 4  # rows actually spread over the new layout
    # merges after the switch land in the new layout
    r = t.merge(ev(spark, [(100, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    assert r.applied and state(t)[("r1", "p1", "c1")] == "new"
    # point lookup uses the manifest's n_buckets (new layout)
    got = t.lookup("r1", "p1").collect()
    assert [x["content"] for x in got] == ["new"]
    # time travel: the pre-rebucket version still reads (its manifest
    # snapshot carries the OLD n_buckets + dirs)
    assert {(r0["repo"], r0["path"], r0["commit"]): r0["content"]
            for r0 in t.read(version=1).collect()} == before


def test_changes_between_versions(spark, tmp_path):
    """Changelog read: I/U/D classification between two committed versions,
    payload from the destination side ('I'/'U') or the source side ('D')."""
    t = mk_table(spark, tmp_path, retain_history=8)
    t.merge(ev(spark, [
        (0, "I", "r1", "a", "c1", "py", "v1"),
        (1, "I", "r2", "b", "c2", "go", "w1"),
        (2, "I", "r3", "c", "c3", "rs", "z1"),
    ]), job="j", batch_id=0)                      # version 1
    t.merge(ev(spark, [
        (3, "U", "r1", "a", "c1", "py", "v2"),    # update
        (4, "D", "r2", "b", "c2", "go", None),    # delete
        (5, "I", "r4", "d", "c4", "js", "q1"),    # insert
        (6, "U", "r3", "c", "c3", "rs", "z1"),    # same content -> NOT a change
    ]), job="j", batch_id=1)                      # version 2

    ch = {(r["repo"], r["change_op"]): r["content"]
          for r in t.changes_between(1, 2, compare_cols=["content"]).collect()}
    assert ch == {("r1", "U"): "v2", ("r2", "D"): "w1", ("r4", "I"): "q1"}
    # empty diff between identical versions
    assert t.changes_between(2, 2, compare_cols=["content"]).count() == 0


def test_cluster_within_buckets_layout_and_state(spark, tmp_path):
    """cluster_within_buckets=['lang']: rows inside every written parquet
    file are runs sorted by lang (tight row-group min/max stats → data
    skipping for selective scans), and the resolved table state is
    IDENTICAL to the unclustered layout — clustering is a layout knob,
    never a semantics knob."""
    import glob

    rows = [
        (i, "I", f"r{i % 5}", f"p{i % 17}", f"c{i}", ["py", "go", "md", "rs"][i % 4], f"v{i}")
        for i in range(400)
    ]
    plain = mk_table(spark, tmp_path / "plain", n_buckets=4)
    plain.merge(ev(spark, rows), job="j", batch_id=0)
    clustered = ParquetSnapshotTable(
        spark, str(tmp_path / "clustered" / "tbl"), n_buckets=4,
        cluster_within_buckets=["lang"],
    )
    clustered.ensure(SCHEMA)
    clustered.merge(ev(spark, rows), job="j", batch_id=0)
    assert state(clustered) == state(plain)

    files = glob.glob(str(tmp_path / "clustered" / "tbl" / "data" / "*" / "*" / "*.parquet"))
    assert files
    for f in files:
        langs = [r["lang"] for r in spark.read.parquet(f).select("lang").collect()]
        assert langs == sorted(langs), f


# ---------------------------------------------------------------------------
# zone maps + modified_since (Iceberg incremental-read analog)
# ---------------------------------------------------------------------------


def test_modified_since_semantics(spark, tmp_path):
    """modified_since(s) = live rows whose WINNING version has _seq >= s:
    updated keys appear, untouched keys don't, deletes stay invisible, and
    an old row that merely shares a bucket with new data is filtered by the
    residual predicate (pruning is bucket-granular, the filter is exact)."""
    t = mk_table(spark, tmp_path, n_buckets=4)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(16)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    t.merge(
        ev(spark, [
            (100, "U", "r1", "p1", "c1", "py", "new1"),
            (101, "I", "rX", "pX", "cX", "py", "vX"),
            (102, "D", "r2", "p2", "c2", "py", None),
        ]),
        job="j", batch_id=1,
    )
    got = {(r["repo"], r["path"]): r["content"] for r in t.modified_since(100).collect()}
    assert got == {("r1", "p1"): "new1", ("rX", "pX"): "vX"}
    # cutoff 0 = full live state; cutoff past max = empty
    assert t.modified_since(0).count() == t.read().count()
    assert t.modified_since(10_000).count() == 0


def test_modified_since_prunes_buckets_driver_side(spark, tmp_path):
    """The zone maps prune untouched buckets BEFORE any file is listed:
    after a trickle batch touching one key, _zone_survivors keeps only the
    bucket(s) the batch landed in — a steady-state incremental export reads
    k touched dirs, not all n."""
    t = mk_table(spark, tmp_path, n_buckets=8)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(64)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    t.merge(ev(spark, [(500, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    man = t._read_manifest()
    assert len(man["bucket_zones"]) == 8
    survivors = t._zone_survivors(man, 500)
    assert len(survivors) == 1
    got = t.modified_since(500).collect()
    assert len(got) == 1 and got[0]["content"] == "new"
    # the pruned plan reads only the surviving bucket's files
    plan = t.modified_since(500)._jdf.queryExecution().executedPlan().toString()
    assert "_bucket_dir=" not in plan or plan.count("data/v") <= 2


def test_zones_widen_conservatively_then_tighten_on_compact(spark, tmp_path):
    """A COW rewrite drops superseded rows but merge-time zones only widen
    (sound for pruning, possibly stale-wide). compact() rescans and resets
    every zone to exact [min,max] bounds."""
    t = mk_table(spark, tmp_path, n_buckets=1)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0)
    t.merge(ev(spark, [(100, "U", "r", "p", "c", "py", "y")]), job="j", batch_id=1)
    man = t._read_manifest()
    assert man["bucket_zones"]["0"] == [0, 100]  # conservative: seq-0 row is gone
    t.compact()
    man2 = t._read_manifest()
    assert man2["bucket_zones"]["0"] == [100, 100]  # exact after rescan
    assert t.modified_since(100).count() == 1


def test_zone_survivors_conservative_without_zones(spark, tmp_path):
    """Manifests written before zone maps existed have no bucket_zones —
    every bucket must survive (correctness over pruning)."""
    t = mk_table(spark, tmp_path, n_buckets=4)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(8)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    man = t._read_manifest()
    legacy = dict(man)
    legacy.pop("bucket_zones")
    assert sorted(t._zone_survivors(legacy, 10_000)) == sorted(
        int(b) for b in man["buckets"]
    )


def test_modified_since_time_travel(spark, tmp_path):
    """modified_since composes with version= time travel: the cutoff applies
    to the PAST snapshot's winners, not the current ones."""
    t = mk_table(spark, tmp_path, n_buckets=2, retain_history=4)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0)
    t.merge(ev(spark, [(10, "U", "r", "p", "c", "py", "y")]), job="j", batch_id=1)
    t.merge(ev(spark, [(20, "U", "r", "p", "c", "py", "z")]), job="j", batch_id=2)
    v2 = t.current_version() - 1
    got = t.modified_since(10, version=v2).collect()
    assert len(got) == 1 and got[0]["content"] == "y"


# ---------------------------------------------------------------------------
# rollback (Iceberg rollback_to_snapshot analog)
# ---------------------------------------------------------------------------


def test_rollback_restores_state_guard_and_keeps_forward_history(spark, tmp_path):
    """rollback(v) creates a NEW version whose content, batch guard and job
    state equal v's; the rolled-over versions stay time-travelable."""
    t = mk_table(spark, tmp_path, retain_history=8)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "v1")]), job="j", batch_id=0)
    t.merge(ev(spark, [(10, "U", "r", "p", "c", "py", "v2")]), job="j", batch_id=1,
            job_state={"max_seq": 10})
    t.merge(ev(spark, [(20, "U", "r", "p", "c", "py", "v3")]), job="j", batch_id=2,
            job_state={"max_seq": 20})
    v_target = t.current_version() - 1  # the batch_id=1 commit
    new_v = t.rollback(v_target)
    assert new_v == v_target + 2
    assert state(t) == {("r", "p", "c"): "v2"}
    man = t._read_manifest()
    assert man["committed"]["j"] == 1       # guard rewound: batch 2 re-appliable
    assert man["state"]["j"] == {"max_seq": 10}
    # the rolled-over v3 state is still addressable for audit
    assert {r["content"] for r in t.read(version=v_target + 1).collect()} == {"v3"}


def test_rollback_is_metadata_only(spark, tmp_path):
    """The restored manifest re-references the old version's data dirs —
    no data directory is written by the rollback commit."""
    import os

    t = mk_table(spark, tmp_path, retain_history=8)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(16)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    v1 = t.current_version()
    man_v1 = t._read_manifest()
    t.merge(ev(spark, [(100, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    dirs_before = sorted(os.listdir(os.path.join(t.root, "data")))
    t.rollback(v1)
    assert sorted(os.listdir(os.path.join(t.root, "data"))) == dirs_before
    assert t._read_manifest()["buckets"] == man_v1["buckets"]


def test_rollback_then_replay_reconverges(spark, tmp_path):
    """After a rollback, re-merging the rolled-back batch (same batch_id)
    APPLIES — its guard entry went with the rollback — and the table
    reconverges to the pre-rollback state."""
    t = mk_table(spark, tmp_path, retain_history=8)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "v1")]), job="j", batch_id=0)
    v1 = t.current_version()
    batch2 = [(10, "U", "r", "p", "c", "py", "v2")]
    t.merge(ev(spark, batch2), job="j", batch_id=1)
    golden = state(t)
    t.rollback(v1)
    r = t.merge(ev(spark, batch2), job="j", batch_id=1)
    assert r.applied
    assert state(t) == golden


def test_rollback_edge_cases(spark, tmp_path):
    t = mk_table(spark, tmp_path, retain_history=1)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "a")]), job="j", batch_id=0)
    t.merge(ev(spark, [(1, "U", "r", "p", "c", "py", "b")]), job="j", batch_id=1)
    t.merge(ev(spark, [(2, "U", "r", "p", "c", "py", "d")]), job="j", batch_id=2)
    cur = t.current_version()
    assert t.rollback(cur) == cur  # no-op
    with pytest.raises(SinkCommitError):
        t.rollback(cur + 5)  # never existed / no history snapshot
    # v0 (the ensure() commit) is a real snapshot: rollback to it = empty
    # table with the guard fully rewound — then the no-op check again
    assert t.rollback(0) == cur + 1
    assert t.read().count() == 0
    assert t._read_manifest()["committed"] == {}
    t.expire_snapshots(keep=1)
    with pytest.raises(SinkCommitError):
        t.rollback(cur - 2)  # expired


def test_rollback_across_rebucket_restores_layout(spark, tmp_path):
    """A rollback across a rebucket restores the OLD bucket layout (readers
    and the writer handle take n_buckets from the manifest), and a
    subsequent merge works under it."""
    t = mk_table(spark, tmp_path, n_buckets=4, retain_history=8)
    rows = [(i, "I", f"r{i}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(16)]
    t.merge(ev(spark, rows), job="j", batch_id=0)
    v1 = t.current_version()
    t.rebucket(8)
    assert t._read_manifest()["n_buckets"] == 8
    t.rollback(v1)
    man = t._read_manifest()
    assert man["n_buckets"] == 4 and t.n_buckets == 4
    t.merge(ev(spark, [(100, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)
    got = state(t)
    assert got[("r1", "p1", "c1")] == "new" and len(got) == 16


# ---------------------------------------------------------------------------
# type-widening schema evolution (B9 extension)
# ---------------------------------------------------------------------------

WIDE_SCHEMA = T.StructType(
    list(SCHEMA.fields) + [T.StructField("size", T.IntegerType())]
)


def wev(spark, rows, size_type=T.IntegerType()):
    sch = T.StructType(list(EV_SCHEMA.fields) + [T.StructField("size", size_type)])
    return spark.createDataFrame(rows, sch)


def test_type_widening_int_to_long(spark, tmp_path):
    """A long batch into an int column widens the TABLE type metadata-only:
    old narrow parquet files are read under the widened schema (SPARK-40876),
    values past 2^31 round-trip, and the manifest schema says long."""
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    t.ensure(WIDE_SCHEMA)
    t.merge(wev(spark, [(0, "I", "r", "p", "c1", "py", "a", 100)]), job="j", batch_id=0)
    big = 5_000_000_000
    t.merge(
        wev(spark, [(10, "I", "r", "p", "c2", "py", "b", big)], T.LongType()),
        job="j", batch_id=1,
    )
    assert dict(t.schema().fields[-1].__dict__.items())["dataType"] == T.LongType()
    got = {r["commit"]: r["size"] for r in t.read().collect()}
    assert got == {"c1": 100, "c2": big}


def test_type_widening_narrow_batch_upcasts(spark, tmp_path):
    """A narrower batch (int into a long column) does NOT narrow the table:
    the batch upcasts losslessly at alignment."""
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    t.ensure(T.StructType(list(SCHEMA.fields) + [T.StructField("size", T.LongType())]))
    t.merge(wev(spark, [(0, "I", "r", "p", "c", "py", "a", 7)]), job="j", batch_id=0)
    assert t.schema().fields[-1].dataType == T.LongType()
    assert t.read().collect()[0]["size"] == 7


def test_type_widening_float_to_double_and_incompatible_raises(spark, tmp_path):
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=2)
    t.ensure(T.StructType(list(SCHEMA.fields) + [T.StructField("score", T.FloatType())]))
    sch = T.StructType(list(EV_SCHEMA.fields) + [T.StructField("score", T.DoubleType())])
    t.merge(
        spark.createDataFrame([(0, "I", "r", "p", "c", "py", "a", 0.5)], sch),
        job="j", batch_id=0,
    )
    assert t.schema().fields[-1].dataType == T.DoubleType()
    # string -> int on the same table: loud failure, not a silent cast
    bad = T.StructType(list(EV_SCHEMA.fields) + [T.StructField("score", T.StringType())])
    with pytest.raises(SinkCommitError, match="incompatible type change"):
        t.merge(
            spark.createDataFrame([(1, "I", "r", "p", "c2", "py", "b", "oops")], bad),
            job="j", batch_id=1,
        )
    # fractional -> integral is NOT a widening either
    badi = T.StructType(list(EV_SCHEMA.fields) + [T.StructField("score", T.LongType())])
    with pytest.raises(SinkCommitError, match="incompatible type change"):
        t.merge(
            spark.createDataFrame([(2, "I", "r", "p", "c3", "py", "d", 1)], badi),
            job="j", batch_id=2,
        )


def test_key_column_type_change_raises(spark, tmp_path):
    """Bucket routing hashes key VALUES — xxhash64 of the same number at a
    different width is a different hash, so key-type changes must refuse."""
    keyed = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.IntegerType()),
            T.StructField("content", T.StringType()),
        ]
    )
    t = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=2)
    t.ensure(keyed)
    bsch = T.StructType(
        [T.StructField("event_sequence", T.LongType()), T.StructField("op", T.StringType()),
         T.StructField("repo", T.StringType()), T.StructField("path", T.StringType()),
         T.StructField("commit", T.LongType()), T.StructField("content", T.StringType())]
    )
    with pytest.raises(SinkCommitError, match="key/bucket column"):
        t.merge(
            spark.createDataFrame([(0, "I", "r", "p", 1, "a")], bsch),
            job="j", batch_id=0,
        )


# ---------------------------------------------------------------------------
# tags (Iceberg named-ref analog)
# ---------------------------------------------------------------------------


def test_tag_lifecycle_and_read(spark, tmp_path):
    t = mk_table(spark, tmp_path, retain_history=4)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "v1")]), job="j", batch_id=0)
    tagged_v = t.create_tag("train-v1")
    t.merge(ev(spark, [(10, "U", "r", "p", "c", "py", "v2")]), job="j", batch_id=1)
    assert t.tags() == {"train-v1": tagged_v}
    assert t.resolve_tag("train-v1") == tagged_v
    got = t.read(tag="train-v1").collect()
    assert [r["content"] for r in got] == ["v1"]
    with pytest.raises(SinkCommitError, match="already exists"):
        t.create_tag("train-v1")
    with pytest.raises(SinkCommitError, match="not both"):
        t.read(version=1, tag="train-v1")
    t.drop_tag("train-v1")
    with pytest.raises(SinkCommitError, match="does not exist"):
        t.resolve_tag("train-v1")
    with pytest.raises(SinkCommitError, match="does not exist"):
        t.drop_tag("train-v1")


def test_tagged_version_survives_expiration_and_gc(spark, tmp_path):
    """The point of tags: a pinned version stays readable after the rolling
    retention window has expired and GC'd everything else around it."""
    t = mk_table(spark, tmp_path, retain_history=0)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "old")]), job="j", batch_id=0)
    tagged_v = t.create_tag("audit")
    # several COW rewrites of the same bucket + maintenance GC
    for i in range(3):
        t.merge(ev(spark, [(10 + i, "U", "r", "p", "c", "py", f"v{i}")]),
                job="j", batch_id=1 + i)
    t.compact()
    assert t.expire_snapshots() >= 0
    assert [r["content"] for r in t.read(tag="audit").collect()] == ["old"]
    # dropping the tag releases it: the next expiration removes the manifest
    t.drop_tag("audit")
    t.expire_snapshots()
    with pytest.raises(SinkCommitError):
        t.read(version=tagged_v)


def test_rollback_keeps_tags(spark, tmp_path):
    t = mk_table(spark, tmp_path, retain_history=8)
    t.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "a")]), job="j", batch_id=0)
    v1 = t.current_version()
    t.merge(ev(spark, [(1, "U", "r", "p", "c", "py", "b")]), job="j", batch_id=1)
    t.create_tag("keep-me")
    t.rollback(v1)
    assert "keep-me" in t.tags()


def test_plan_schema_changes_classification():
    """Dry-run classifier mirrors merge()'s evolution decisions exactly."""
    import pyspark.sql.types as T

    from wprdc_etl_spark.plans.lake import plan_schema_changes

    table = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("stars", T.IntegerType()),
            T.StructField("ratio", T.FloatType()),
            T.StructField("note", T.StringType()),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    batch = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("stars", T.LongType()),      # widens
            T.StructField("ratio", T.FloatType()),     # unchanged
            T.StructField("flag", T.StringType()),     # incompatible
            T.StructField("license", T.StringType()),  # added
        ]
    )
    rows = {
        r["column"]: r
        for r in plan_schema_changes(
            table, batch, keys=["repo", "path"], bucket_keys=["repo", "path"]
        )
    }
    assert rows["path"]["kind"] == "missing_key" and rows["path"]["blocking"]
    assert rows["stars"]["kind"] == "widened" and "bigint" in rows["stars"]["action"]
    assert rows["ratio"]["kind"] == "unchanged"
    assert rows["flag"]["kind"] == "incompatible" and rows["flag"]["blocking"]
    assert rows["note"]["kind"] == "batch_omits" and not rows["note"]["blocking"]
    assert rows["license"]["kind"] == "added"
    # key width change blocks even though int->long would widen elsewhere
    batch2 = T.StructType(
        [T.StructField("repo", T.IntegerType()), T.StructField("path", T.StringType())]
    )
    table2 = T.StructType(
        [T.StructField("repo", T.LongType()), T.StructField("path", T.StringType())]
    )
    rows2 = {
        r["column"]: r
        for r in plan_schema_changes(table2, batch2, keys=["repo", "path"])
    }
    assert rows2["repo"]["kind"] == "key_type_change" and rows2["repo"]["blocking"]
    # batch narrower on a shared non-key column is non-blocking
    t3 = T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.LongType())])
    b3 = T.StructType([T.StructField("k", T.StringType()), T.StructField("v", T.IntegerType())])
    r3 = {r["column"]: r for r in plan_schema_changes(t3, b3, keys=["k"])}
    assert r3["v"]["kind"] == "batch_narrower" and not r3["v"]["blocking"]


def test_bloom_filter_keys_written_and_lookup_unchanged(spark, tmp_path):
    """bloom_filter_keys=True threads parquet bloom options into every
    bucketed write: same data, bloom-enabled files strictly larger (the
    footer carries one bloom per key column per file — pyarrow 16 can't
    surface the offsets, so the size delta is the observable), and
    lookup()/read() results are identical (blooms only SKIP row groups
    that provably lack the key)."""
    import glob
    import os as _os

    rows = [(i, "I", f"r{i % 31}", f"p{i}", f"c{i}", "py", f"v{i}") for i in range(3000)]
    sizes = {}
    for flag in (False, True):
        t = mk_table(spark, tmp_path / f"b{flag}", n_buckets=4, bloom_filter_keys=flag)
        t.merge(ev(spark, rows), job="j", batch_id=0)
        sizes[flag] = sum(
            _os.path.getsize(f)
            for f in glob.glob(str(tmp_path / f"b{flag}" / "tbl" / "data" / "**" / "*.parquet"), recursive=True)
        )
        hit = t.lookup("r3", "p3")
        assert [r["content"] for r in hit.collect()] == ["v3"]
        assert t.lookup("r99", "nope").count() == 0
    assert sizes[True] > sizes[False], sizes
