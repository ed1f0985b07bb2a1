"""Multi-writer commits: optimistic rebase (Iceberg's commit-retry model —
SnapshotProducer conflict detection by file/partition overlap, re-expressed
over bucket entries) plus the physical prerequisites that make it safe:
token-unique attempt dirs (no cross-writer file clobber) and in-flight
markers (no GC of a concurrent writer's mid-commit dirs).

Interleaving is simulated deterministically: writer B reads its base
manifest, writer A commits, then B's merge is forced to derive from the
stale base by patching ``_require_manifest`` — the CAS inside
``_swap_manifest`` still reads the REAL head under the lock, exactly the
window a true concurrent writer hits.
"""

import json
import os
import time

import pytest

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.operators.xxhash import bucket_of_py
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from tests.test_lake_merge import EV_SCHEMA, SCHEMA, ev, state  # reuse helpers

N_BUCKETS = 8


def keys_in_bucket(bucket: int, n: int, start: int = 0) -> list[tuple]:
    """n deterministic (repo, path) keys routing to the given bucket."""
    out = []
    i = start
    while len(out) < n:
        r, p = f"r{i}", f"p{i}"
        if bucket_of_py(N_BUCKETS, r, p) == bucket:
            out.append((r, p))
        i += 1
    return out


def mk(spark, root, **kw):
    kw.setdefault("n_buckets", N_BUCKETS)
    # concurrent writers read their base snapshot while the head advances:
    # retention must cover the in-flight window or the stale reader's scan
    # hits GC'd dirs (the documented multi-writer deployment requirement)
    kw.setdefault("retain_history", 4)
    t = ParquetSnapshotTable(spark, str(root), **kw)
    t.ensure(SCHEMA)
    return t


def rows(keys, seq0, content):
    return [
        (seq0 + i, "I", r, p, "c1", "py", f"{content}{i}")
        for i, (r, p) in enumerate(keys)
    ]


def stale_handle(spark, root, base_manifest):
    """A table handle whose merge derives from a frozen base manifest —
    writer B mid-flight while others commit."""
    t = ParquetSnapshotTable(spark, str(root), n_buckets=N_BUCKETS)

    def frozen():
        # deep copy per call: merge mutates dicts derived from it
        return json.loads(json.dumps(base_manifest))

    t._require_manifest = frozen
    return t


def test_rebase_disjoint_buckets_both_commit(spark, tmp_path):
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 3)
    kb = keys_in_bucket(5, 3)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)

    base = json.load(open(t._manifest_path))
    # writer A commits more rows into bucket 1
    ra = t.merge(ev(spark, rows(ka, 100, "A")), job="ja", batch_id=1)
    assert ra.applied and not ra.rebased

    # writer B, holding the pre-A base, commits into bucket 5 → rebase
    tb = stale_handle(spark, root, base)
    rb = tb.merge(ev(spark, rows(kb, 200, "B")), job="jb", batch_id=0)
    assert rb.applied and rb.rebased
    assert rb.version == ra.version + 1

    # both writers' rows are live; nothing was lost either way
    fresh = ParquetSnapshotTable(spark, str(root), n_buckets=N_BUCKETS)
    s = state(fresh)
    for i, (r, p) in enumerate(ka):
        assert s[(r, p, "c1")] == f"A{i}"
    for i, (r, p) in enumerate(kb):
        assert s[(r, p, "c1")] == f"B{i}"
    # guard entries for BOTH jobs survive on the rebased head
    assert fresh.last_committed_batch("ja") == 1
    assert fresh.last_committed_batch("jb") == 0
    # the rebased commit is an ordinary version: time travel still works
    assert [h["version"] for h in fresh.history()][-1] == rb.version


def test_rebase_overlapping_bucket_fails_clean_then_retry(spark, tmp_path):
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(2, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)

    base = json.load(open(t._manifest_path))
    t.merge(ev(spark, rows(ka, 100, "A")), job="ja", batch_id=1)

    # writer B (stale) touches the SAME bucket → conflicting rewrite
    tb = stale_handle(spark, root, base)
    kb = keys_in_bucket(2, 2, start=1000)
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        tb.merge(ev(spark, rows(kb, 200, "B")), job="jb", batch_id=0)

    # A's commit is fully intact — B's failed attempt clobbered nothing
    fresh = ParquetSnapshotTable(spark, str(root), n_buckets=N_BUCKETS)
    s = state(fresh)
    for i, (r, p) in enumerate(ka):
        assert s[(r, p, "c1")] == f"A{i}"
    assert fresh.last_committed_batch("jb") is None

    # the standard recovery: re-read and re-apply, now against the head
    rb = fresh.merge(ev(spark, rows(kb, 200, "B")), job="jb", batch_id=0)
    assert rb.applied and not rb.rebased
    s = state(fresh)
    for i, (r, p) in enumerate(kb):
        assert s[(r, p, "c1")] == f"B{i}"


def test_rebase_bails_on_schema_and_property_divergence(spark, tmp_path):
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 2)
    kb = keys_in_bucket(5, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)

    # concurrent schema evolution (writer A adds a column)
    base = json.load(open(t._manifest_path))
    evolved = ev(spark, rows(ka, 100, "A")).withColumn(
        "extra", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("x")
    )
    t.merge(evolved, job="ja", batch_id=1)
    tb = stale_handle(spark, root, base)
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        tb.merge(ev(spark, rows(kb, 200, "B")), job="jb", batch_id=0)

    # concurrent constraint add (property divergence) must also bail:
    # B's batch was never validated against the new constraint
    base2 = json.load(open(t._manifest_path))
    t.add_constraint("content_nonnull", "content IS NOT NULL")
    tb2 = stale_handle(spark, root, base2)
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        tb2.merge(ev(spark, rows(kb, 300, "B")), job="jb", batch_id=1)


def test_rebase_bails_on_same_job_and_staged(spark, tmp_path):
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 2)
    kb = keys_in_bucket(5, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="j", batch_id=0)

    base = json.load(open(t._manifest_path))
    t.merge(ev(spark, rows(ka, 100, "A")), job="j", batch_id=1)

    # same-job concurrent commit: ordering hazard, never rebased — even on
    # disjoint buckets
    tb = stale_handle(spark, root, base)
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        tb.merge(ev(spark, rows(kb, 200, "B")), job="j", batch_id=1)

    # staged (WAP) commits never rebase: publish resolution must stay linear
    base2 = json.load(open(t._manifest_path))
    t.merge(ev(spark, rows(ka, 300, "A2")), job="j", batch_id=2)
    tb2 = stale_handle(spark, root, base2)
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        tb2.merge(ev(spark, rows(kb, 400, "B")), job="jb", batch_id=0, staged=True)


def test_rebase_disabled_by_flag(spark, tmp_path):
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 2)
    kb = keys_in_bucket(5, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)
    base = json.load(open(t._manifest_path))
    t.merge(ev(spark, rows(ka, 100, "A")), job="ja", batch_id=1)

    tb = stale_handle(spark, root, base)
    tb.optimistic_rebase = False
    with pytest.raises(SinkCommitError, match="concurrent writer"):
        tb.merge(ev(spark, rows(kb, 200, "B")), job="jb", batch_id=0)


def test_rebase_empty_commit_merges_guard_only(spark, tmp_path):
    """An empty batch (guard advance only) rebases trivially — it touches
    no bucket, so it composes with ANY concurrent commit."""
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)
    base = json.load(open(t._manifest_path))
    t.merge(ev(spark, rows(ka, 100, "A")), job="ja", batch_id=1)

    tb = stale_handle(spark, root, base)
    rb = tb.merge(ev(spark, []), job="jb", batch_id=0)
    assert rb.applied and rb.rebased
    fresh = ParquetSnapshotTable(spark, str(root), n_buckets=N_BUCKETS)
    assert fresh.last_committed_batch("jb") == 0
    assert state(fresh)[(ka[0][0], ka[0][1], "c1")] == "A0"


def test_inflight_marker_shields_concurrent_write_from_gc(spark, tmp_path):
    """A mid-write attempt dir (version ≤ head, not yet referenced) must
    survive another writer's in-commit orphan GC while its marker is live,
    and be swept once the marker goes stale."""
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)

    # simulate writer B mid-write: attempt dir + live marker
    tok = "ab12cd34ef56"
    attempt = os.path.join(t.root, "data", f"v1_w{tok}")
    os.makedirs(attempt)
    open(os.path.join(attempt, "part-0.parquet"), "w").write("x")
    marker = os.path.join(t.root, "data", f".inflight.{tok}")
    open(marker, "w").write("123\n")

    t.merge(ev(spark, rows(ka, 100, "A")), job="ja", batch_id=1)
    assert os.path.isdir(attempt), "live marker must shield the attempt dir"
    # vacuum honors it too, regardless of dir age
    old = time.time() - 99999
    os.utime(attempt, (old, old))
    rep = t.vacuum(grace_seconds=0)
    assert f"data/v1_w{tok}" in rep["kept_grace"]

    # marker goes stale (crashed writer) → ordinary orphan, swept
    os.utime(marker, (old, old))
    t.merge(ev(spark, rows(ka, 200, "A2")), job="ja", batch_id=2)
    assert not os.path.isdir(attempt)
    assert not os.path.exists(marker)  # stale marker swept alongside


def test_unique_attempt_dirs_never_collide(spark, tmp_path):
    """Two writers sharing a base version write physically distinct dirs —
    the loser's mode('overwrite') can no longer clobber the winner's
    committed files (the pre-token hazard)."""
    root = tmp_path / "tbl"
    t = mk(spark, root)
    ka = keys_in_bucket(1, 2)
    kb = keys_in_bucket(5, 2)
    t.merge(ev(spark, rows(ka, 0, "seed")), job="ja", batch_id=0)
    base = json.load(open(t._manifest_path))

    t.merge(ev(spark, rows(ka, 100, "A")), job="ja", batch_id=1)
    tb = stale_handle(spark, root, base)
    tb.merge(ev(spark, rows(kb, 200, "B")), job="jb", batch_id=0)

    # both attempts wrote version-2 dirs under DIFFERENT tokens
    v2 = [n for n in os.listdir(os.path.join(str(root), "data"))
          if n.startswith("v2_w")]
    assert len(v2) == 2 and len(set(v2)) == 2
