"""TableReplicator — incremental table→table replication over the changelog
(plans/replicate.py): bootstrap → incremental → noop, exactly-once via the
replica's own batch guard, delete propagation, retention-expiry repair,
additive schema evolution, and cross-layout replication."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.plans.replicate import TableReplicator

from test_lake_merge import ev, mk_table, state


def mk_replica(spark, tmp, **kw):
    kw.setdefault("n_buckets", 2)  # deliberately different layout
    return ParquetSnapshotTable(spark, str(tmp / "replica"), **kw)


def _rep(spark, tmp, src, **kw):
    return TableReplicator(src, mk_replica(spark, tmp), job="rep", **kw)


def test_bootstrap_then_incremental(spark, tmp_path):
    src = mk_table(spark, tmp_path, retain_history=8)
    src.merge(ev(spark, [
        (1, "I", "r1", "a", "c1", "py", "x"),
        (2, "I", "r1", "b", "c1", "py", "y"),
        (3, "I", "r2", "a", "c1", "py", "z"),
    ]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["lang", "content"])

    r = rep.sync()
    assert r["mode"] == "bootstrap" and r["applied"]
    assert state(rep.replica) == state(src)
    assert rep.cursor() == src.current_version()

    # update + delete + insert → incremental delta only
    src.merge(ev(spark, [
        (4, "U", "r1", "a", "c1", "py", "x2"),
        (5, "D", "r2", "a", "c1", None, None),
        (6, "I", "r3", "a", "c1", "go", "w"),
    ]), job="j", batch_id=1)
    r = rep.sync()
    assert r["mode"] == "incremental" and r["applied"]
    assert state(rep.replica) == state(src)
    assert rep.verify()["match"]

    # unchanged source → noop, cursor stays
    assert rep.sync()["mode"] == "noop"


def test_exactly_once_same_version(spark, tmp_path):
    src = mk_table(spark, tmp_path, retain_history=8)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "x")]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["content"])
    assert rep.sync()["applied"]
    v = rep.cursor()
    # a second replicator instance replaying the same version is a guard skip
    rep2 = TableReplicator(src, rep.replica, job="rep", compare_cols=["content"])
    r = rep2.sync(to_version=v)
    assert r["mode"] == "noop" and not r["applied"]
    assert state(rep.replica) == state(src)


def test_repair_after_retention_expiry(spark, tmp_path):
    src = mk_table(spark, tmp_path, retain_history=0)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "x")]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["content"])
    assert rep.sync()["mode"] == "bootstrap"
    # two more commits; retain_history=0 GC'd the cursor version's snapshot
    src.merge(ev(spark, [(2, "U", "r1", "a", "c1", "py", "x2")]), job="j", batch_id=1)
    src.merge(ev(spark, [
        (3, "I", "r2", "a", "c1", "py", "z"),
        (4, "D", "r1", "a", "c1", None, None),
    ]), job="j", batch_id=2)
    r = rep.sync()
    # COW dir-sharing may keep the cursor version readable (incremental) or
    # not (repair) — either way the replica must land on the source state
    assert r["mode"] in ("incremental", "repair") and r["applied"]
    assert state(rep.replica) == state(src)
    assert rep.verify()["match"]


def test_repair_mode_when_history_snapshot_missing(spark, tmp_path):
    import os, glob, shutil

    src = mk_table(spark, tmp_path, retain_history=8)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "x")]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["content"])
    rep.sync()
    src.merge(ev(spark, [(2, "I", "r2", "a", "c1", "py", "y")]), job="j", batch_id=1)
    # delete the cursor version's history manifest → changes_between raises
    for p in glob.glob(os.path.join(src.root, "history", "manifest.v*.json")):
        if not p.endswith(f"v{src.current_version()}.json"):
            os.remove(p)
    r = rep.sync()
    assert r["mode"] == "repair" and r["applied"]
    assert state(rep.replica) == state(src)


def test_schema_evolution_propagates(spark, tmp_path):
    src = mk_table(spark, tmp_path, retain_history=8)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "x")]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["content"])
    rep.sync()
    # additive evolution on the source: a license column appears
    evolved = ev(spark, [(2, "I", "r1", "b", "c1", "py", "y")]).withColumn(
        "license", F.lit("mit")
    )
    src.merge(evolved, job="j", batch_id=1)
    r = rep.sync()
    assert r["mode"] == "incremental"
    rs = rep.replica.read()
    assert "license" in rs.columns
    got = {(x["repo"], x["path"]): x["license"] for x in rs.collect()}
    assert got == {("r1", "a"): None, ("r1", "b"): "mit"}


def test_key_mismatch_rejected(spark, tmp_path):
    src = mk_table(spark, tmp_path)
    bad = ParquetSnapshotTable(spark, str(tmp_path / "bad"), keys=["repo", "path"])
    with pytest.raises(SinkCommitError):
        TableReplicator(src, bad)


def test_verify_before_any_sync_raises(spark, tmp_path):
    src = mk_table(spark, tmp_path)
    rep = _rep(spark, tmp_path, src)
    with pytest.raises(SinkCommitError):
        rep.verify()


def test_incremental_sync_keeps_payload_out_of_diff_exchanges(spark, tmp_path):
    """Scale shape of the incremental path: the full-outer version diff and
    its exchanges run on (keys + content fingerprint) ONLY — the content
    payload joins back late and never rides the diff shuffle."""
    import re

    from test_lake_merge import _formatted_plan

    src = mk_table(spark, tmp_path, retain_history=8)
    src.merge(ev(spark, [
        (i, "I", f"r{i % 3}", f"p{i}", "c1", "py", f"v{i}") for i in range(12)
    ]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["lang"])
    rep.sync()
    src.merge(ev(spark, [(20, "U", "r1", "p1", "c1", "py", "new")]), job="j", batch_id=1)

    last, to_v = rep.cursor(), src.current_version()
    changes = src.changes_between(last, to_v, compare_cols=["lang"])
    batch = rep._materialize(changes, src.read(version=to_v))
    plan = _formatted_plan(batch)
    # Diff-side exchanges (identifiable by the _a_/_b_ compare aliases or
    # change_op) must be narrow. The ONE exchange allowed to carry content
    # is the late-materialization join's snapshot side, which carries
    # neither alias. At least one exchange of each kind must exist.
    diff_seen = payload_seen = False
    for m in re.finditer(r"\(\d+\) (\w*Exchange\w*)[^\n]*\n((?:[A-Za-z][^\n]*\n)*)", plan):
        body = m.group(2)
        if "_a_lang#" in body or "_b_lang#" in body or "change_op#" in body:
            diff_seen = True
            assert "content#" not in body, f"payload crossed {m.group(1)}:\n{body}"
        elif "content#" in body:
            payload_seen = True
    assert diff_seen and payload_seen


def test_empty_delta_still_advances_cursor(spark, tmp_path):
    src = mk_table(spark, tmp_path, retain_history=8)
    src.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "x")]), job="j", batch_id=0)
    rep = _rep(spark, tmp_path, src, compare_cols=["content"])
    rep.sync()
    # a source commit that nets to zero changes (same content re-upserted)
    src.merge(ev(spark, [(2, "U", "r1", "a", "c1", "py", "x")]), job="j", batch_id=1)
    r = rep.sync()
    assert r["mode"] == "incremental" and r["applied"]
    assert rep.cursor() == src.current_version()
    assert state(rep.replica) == state(src)
