"""TableRouter — content-based fan-out of one change log into per-route
tables (plans/router.py): first-match routing, default/drop semantics,
per-table exactly-once guards (crash between per-table commits replays
clean), IngestJob drop-in compatibility, and tagged union reads.

Reference analog: one wprdc-etl Pipeline per CKAN resource
(`pipeline/pipeline.py` bound to a single resource_id) — the router is the
one-scan multiplexed version (Debezium ContentBasedRouter semantics)."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.plans.router import DEFAULT_ROUTE, TableRouter

from test_lake_merge import SCHEMA, ev, mk_table, state


def _t(spark, tmp, name):
    t = ParquetSnapshotTable(spark, str(tmp / name), n_buckets=2)
    t.ensure(SCHEMA)
    return t


def _router(spark, tmp, *, default=True, persist_batch=True):
    ta = _t(spark, tmp, "mega")
    tb = _t(spark, tmp, "orgs")
    td = _t(spark, tmp, "rest") if default else None
    r = TableRouter(
        [
            ("mega", "repo = 'mega/monorepo'", ta),
            # overlaps route 1 on purpose: first match must win
            ("orgs", "repo LIKE 'org%' OR repo = 'mega/monorepo'", tb),
        ],
        default=td,
        persist_batch=persist_batch,
    )
    return r, ta, tb, td


BATCH = [
    (1, "I", "mega/monorepo", "a", "c1", "py", "m1"),
    (2, "I", "org1/repo1", "a", "c1", "py", "o1"),
    (3, "I", "other/repo", "a", "c1", "py", "x1"),
    (4, "U", "mega/monorepo", "a", "c1", "py", "m2"),
]


def test_first_match_and_default(spark, tmp_path):
    r, ta, tb, td = _router(spark, tmp_path)
    res = r.merge(ev(spark, BATCH), job="j", batch_id=0)
    assert res.applied and res.strategy == "fanout"
    # mega rows match BOTH predicates -> land only in route 1
    assert state(ta) == {("mega/monorepo", "a", "c1"): "m2"}
    assert state(tb) == {("org1/repo1", "a", "c1"): "o1"}
    assert state(td) == {("other/repo", "a", "c1"): "x1"}
    assert set(res.per_route) == {"mega", "orgs", DEFAULT_ROUTE}


def test_unmatched_dropped_without_default(spark, tmp_path):
    r, ta, tb, _ = _router(spark, tmp_path, default=False)
    r.merge(ev(spark, BATCH), job="j", batch_id=0)
    assert state(ta) == {("mega/monorepo", "a", "c1"): "m2"}
    assert ("other/repo", "a", "c1") not in state(tb)


def test_replay_is_noop(spark, tmp_path):
    r, ta, tb, td = _router(spark, tmp_path)
    r.merge(ev(spark, BATCH), job="j", batch_id=0)
    before = (state(ta), state(tb), state(td))
    res = r.merge(ev(spark, BATCH), job="j", batch_id=0)
    assert not res.applied
    assert all(not x.applied for x in res.per_route.values())
    assert (state(ta), state(tb), state(td)) == before


def test_crash_between_table_commits_replays_clean(spark, tmp_path):
    """Simulate a crash after route 1 committed but before route 2: route
    1's slice is pre-committed under the same (job, batch_id); the router
    replay must skip it and apply the rest."""
    r, ta, tb, td = _router(spark, tmp_path)
    pre = ev(spark, BATCH).where(F.col("repo") == "mega/monorepo")
    ta.merge(pre, job="j", batch_id=0)
    res = r.merge(ev(spark, BATCH), job="j", batch_id=0)
    assert not res.per_route["mega"].applied  # guard skip
    assert res.per_route["orgs"].applied and res.per_route[DEFAULT_ROUTE].applied
    assert state(ta) == {("mega/monorepo", "a", "c1"): "m2"}
    assert state(tb) == {("org1/repo1", "a", "c1"): "o1"}
    assert state(td) == {("other/repo", "a", "c1"): "x1"}


def test_read_union_tagged(spark, tmp_path):
    r, *_ = _router(spark, tmp_path)
    r.merge(ev(spark, BATCH), job="j", batch_id=0)
    rows = {(x["_route"], x["repo"]) for x in r.read().collect()}
    assert rows == {
        ("mega", "mega/monorepo"),
        ("orgs", "org1/repo1"),
        (DEFAULT_ROUTE, "other/repo"),
    }


def test_ingestjob_drop_in(spark, tmp_path):
    """The router satisfies the sink contract end to end: IngestJob replay
    lands each event in its route's table and a re-run is a guard no-op."""
    from wprdc_etl_spark.streaming.job import IngestJob

    log = str(tmp_path / "log")
    ev(spark, BATCH).withColumn(
        "event_ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
    ).write.parquet(log)
    r, ta, tb, td = _router(spark, tmp_path)
    job = (
        IngestJob("routed")
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(r)
        .build()
    )
    job.run_batch(spark)
    assert state(ta) == {("mega/monorepo", "a", "c1"): "m2"}
    assert state(tb) == {("org1/repo1", "a", "c1"): "o1"}
    assert state(td) == {("other/repo", "a", "c1"): "x1"}
    # job accounting landed in the primary table's lineage (summary row)
    lin = ta.read_lineage().where(
        (F.col("job") == "routed") & (F.col("partition") == -1)
    ).collect()
    assert lin and lin[0]["rows_upserted"] >= 1
    job.run_batch(spark)  # replay: every table skips
    assert state(ta) == {("mega/monorepo", "a", "c1"): "m2"}


def test_validation_rejects_shared_tables(spark, tmp_path):
    t = _t(spark, tmp_path, "one")
    with pytest.raises(ValueError, match="own table"):
        TableRouter([("a", "1=1", t), ("b", "1=1", t)])
    t2 = ParquetSnapshotTable(spark, t.root, n_buckets=2)
    with pytest.raises(ValueError, match="share a table root"):
        TableRouter([("a", "1=1", t), ("b", "1=1", t2)])
    with pytest.raises(ValueError, match="duplicate route names"):
        TableRouter(
            [("a", "1=1", t), ("a", "1=1", _t(spark, tmp_path, "two"))]
        )
    with pytest.raises(ValueError, match="reserved"):
        TableRouter([(DEFAULT_ROUTE, "1=1", t)])


def test_last_committed_is_min_over_members(spark, tmp_path):
    r, ta, tb, td = _router(spark, tmp_path)
    assert r.last_committed_batch("j") is None
    r.merge(ev(spark, BATCH), job="j", batch_id=0)
    assert r.last_committed_batch("j") == 0
    # one member ahead -> min still reports the laggard's position
    ta.merge(
        ev(spark, [(9, "U", "mega/monorepo", "a", "c1", "py", "m9")]),
        job="j",
        batch_id=1,
    )
    assert r.last_committed_batch("j") == 0


def test_staged_fanout_invisible_until_atomic_publish(spark, tmp_path):
    """merge(staged=True) stages every member chain; MultiTablePublish
    exposes all members with one decision (plans/txn_commit.py)."""
    from wprdc_etl_spark.plans.txn_commit import MultiTablePublish

    r, ta, tb, td = _router(spark, tmp_path)
    r.merge(ev(spark, BATCH), job="j", batch_id=0, staged=True)
    for t in (ta, tb, td):
        assert t.read().count() == 0
        assert t.staged_versions() != []
    MultiTablePublish(str(tmp_path / "co")).publish_all(
        {"mega": ta, "orgs": tb, "rest": td}
    )
    assert state(ta) == {("mega/monorepo", "a", "c1"): "m2"}
    assert state(tb) == {("org1/repo1", "a", "c1"): "o1"}
    assert state(td) == {("other/repo", "a", "c1"): "x1"}


def test_staged_fanout_rejects_unstageable_member(spark, tmp_path):
    """A member sink without staged merge fails the whole fan-out loudly —
    a partly-staged transaction could never publish atomically."""
    from wprdc_etl_spark.exceptions import SinkCommitError

    class NoStage:
        root = None

        def merge(self, batch_df, *, job, batch_id, **kw):  # no `staged`
            raise AssertionError("must not be reached")

    ta = _t(spark, tmp_path, "a")
    r = TableRouter([("a", "true", ta)], default=None)
    r.routes.append(("b", "false", NoStage()))
    with pytest.raises(SinkCommitError, match="staged"):
        r.merge(ev(spark, BATCH), job="j", batch_id=0, staged=True)
