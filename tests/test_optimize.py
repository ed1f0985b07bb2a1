"""Auto-maintenance policy (plans/lake.py::plan_maintenance/optimize):
manifest-only scheduling decisions — compact when delta chains build up,
rebucket with hysteresis when buckets outgrow the target, expire beyond the
audit slack — and the no-op guarantee on a healthy table."""

from test_lake_merge import ev, mk_table, state


def _merge(t, spark, rows, batch_id, **kw):
    t.merge(ev(spark, rows), job="opt", batch_id=batch_id, **kw)


def test_healthy_table_is_noop(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    _merge(t, spark, [(1, "I", "r1", "a", "c1", "py", "x")], 0)
    r = t.optimize()
    assert r["actions"] == {}
    assert r["plan"]["compact"] is False
    assert r["plan"]["rebucket_to"] is None
    assert r["plan"]["expire"] is False


def test_compact_due_on_delta_chains(spark, tmp_path):
    # force MOR deltas with a high inline-compaction ceiling, then let the
    # policy fire at the halfway threshold
    t = mk_table(spark, tmp_path, write_mode="mor", max_deltas=8)
    _merge(t, spark, [(1, "I", "r1", "a", "c1", "py", "x")], 0)
    for i in range(4):
        _merge(t, spark, [(2 + i, "U", "r1", "a", "c1", "py", f"v{i}")], 1 + i)
    plan = t.plan_maintenance()
    assert plan["max_delta_chain"] >= 4 and plan["compact"] is True
    before = state(t)
    r = t.optimize()
    assert "compact" in r["actions"]
    assert state(t) == before  # state-preserving
    assert t.plan_maintenance()["compact"] is False  # chains folded


def test_rebucket_due_with_hysteresis(spark, tmp_path):
    t = mk_table(spark, tmp_path, n_buckets=2)
    _merge(t, spark, [
        (i, "I", f"r{i}", f"p{i}", "c1", "py", "x") for i in range(20)
    ], 0)
    # 10 rows/bucket: due at target 2 (20 > 2*2*2), sized to fit the target
    plan = t.plan_maintenance(target_rows_per_bucket=2)
    assert plan["rebucket_to"] == 16  # 20 rows / 16 buckets <= 2
    # hysteresis: within 2x of target -> not due
    assert t.plan_maintenance(target_rows_per_bucket=8)["rebucket_to"] is None
    before = state(t)
    r = t.optimize(target_rows_per_bucket=2)
    assert r["actions"]["rebucket"] == t.current_version()
    assert t.n_buckets == 16 and state(t) == before


def test_expire_due_beyond_slack(spark, tmp_path):
    t = mk_table(spark, tmp_path)
    for i in range(5):
        _merge(t, spark, [(i + 1, "U", "r1", "a", "c1", "py", f"v{i}")], i)
    # 5 commits + create: old manifests stay within the audit slack...
    assert t.plan_maintenance()["expire"] is False
    # ...but a tight slack makes expiration due, and optimize runs it
    assert t.plan_maintenance(expire_slack=2)["expire"] is True
    r = t.optimize(expire_slack=2)
    assert r["actions"]["expired_snapshots"] > 0
    assert t.plan_maintenance(expire_slack=2)["expire"] is False


# ---- vacuum (remove_orphan_files analog) -----------------------------------


def test_vacuum_removes_stale_orphans_keeps_live_and_fresh(spark, tmp_path):
    import os
    import time as _t

    t = mk_table(spark, tmp_path)
    _merge(t, spark, [(1, "I", "r1", "a", "c1", "py", "x")], 0)
    _merge(t, spark, [(2, "U", "r1", "a", "c1", "py", "y")], 1)
    before = state(t)
    # crashed FUTURE attempt: data dir for a version the counter never
    # reached — invisible to the in-commit _gc_orphans sweep
    orphan = os.path.join(t.root, "data", "v99")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as fh:
        fh.write("junk")
    old = _t.time() - 7200
    os.utime(orphan, (old, old))
    # fresh orphan: a concurrent writer mid-commit — must survive grace
    fresh = os.path.join(t.root, "data", "v100")
    os.makedirs(fresh)
    rep = t.vacuum(grace_seconds=3600)
    assert rep["removed"] == ["data/v99"]
    assert rep["kept_grace"] == ["data/v100"]
    assert not os.path.exists(orphan) and os.path.exists(fresh)
    assert state(t) == before  # live dirs untouched


def test_vacuum_respects_tags_and_history(spark, tmp_path):
    import os
    import time as _t

    t = mk_table(spark, tmp_path, retain_history=2)
    _merge(t, spark, [(1, "I", "r1", "a", "c1", "py", "x")], 0)
    t.create_tag("pin")
    _merge(t, spark, [(2, "U", "r1", "a", "c1", "py", "y")], 1)
    _merge(t, spark, [(3, "U", "r1", "a", "c1", "py", "z")], 2)
    before = state(t)
    # age every dir: nothing referenced may be vacuumed regardless of age
    data_root = os.path.join(t.root, "data")
    for name in os.listdir(data_root):
        old = _t.time() - 7200
        os.utime(os.path.join(data_root, name), (old, old))
    rep = t.vacuum(grace_seconds=3600)
    assert rep["removed"] == []
    assert state(t) == before
    assert t.read(tag="pin").count() == 1


def test_iceberg_remove_orphans_sql():
    from wprdc_etl_spark.plans import iceberg as ice

    sql = ice.remove_orphans_sql("cat.db.t", older_than_ts="2024-01-01 00:00:00")
    assert "remove_orphan_files" in sql and "older_than => TIMESTAMP '2024-01-01 00:00:00'" in sql
    assert "table => 'db.t'" in sql and sql.startswith("CALL cat.system.")
