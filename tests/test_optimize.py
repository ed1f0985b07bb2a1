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
