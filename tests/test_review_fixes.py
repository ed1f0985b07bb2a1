"""Regression pins for the round-3 self-review findings: each test locks a
fix for a silent-data-loss or engine-vs-oracle divergence found by an
adversarial review of the round-3 diff (the same review posture VERDICT's
ADVICE applies), so none can quietly regress.

Covered fixes:
- ``update_where`` evaluates every RHS against the OLD row (SQL UPDATE
  semantics; drop-in parity with ``IcebergTable.update_where``).
- ``expire_snapshots`` clamps ``keep`` to the ``retain_history`` floor —
  time travel inside the retention window survives an aggressive keep.
- the history snapshot is written BEFORE the manifest swap and a failure
  fails the commit (WAP publish resolution depends on it); versions beyond
  the head are rejected rather than served from orphan snapshots.
- ``requeue_quarantine`` never deletes a quarantine dir whose merge was
  guard-skipped for a batch the sink has already moved past.
- trigram index postings refresh their payload on payload-only updates.
- the gapfill / tumbling-window DuckDB twins use floor-mod (pre-epoch
  timestamps bucket identically to Spark's pmod).
- an empty/fully-quarantined first batch reports applied_seq = -1, not 0.
- the txn-gate pending carry is materialized per batch (no recursive plan
  over the whole log prefix).
- WAP ``staged=True`` on a sink without staged merge fails at build().
"""

import os

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import IncompletePipelineError, SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from test_dml import EV_SCHEMA, ev, seeded, state


# ---- update_where simultaneous-assignment semantics -------------------------


def test_update_where_rhs_sees_old_row(spark, tmp_path):
    """The classic swap: both RHS reference the other column. Sequential
    withColumn would yield ('aa', 'aa'); SQL UPDATE yields the swap."""
    t = seeded(spark, tmp_path)
    t.update_where("path = 'a.py'", {"lang": "content", "content": "lang"})
    assert state(t)[("r1", "a.py", "c1")] == ("aa", "py")


def test_update_where_assignment_order_irrelevant(spark, tmp_path):
    ta = seeded(spark, tmp_path / "a")
    tb = seeded(spark, tmp_path / "b")
    ta.update_where(
        "path = 'b.go'",
        {"lang": "upper(content)", "content": "concat(lang, content)"},
    )
    tb.update_where(
        "path = 'b.go'",
        {"content": "concat(lang, content)", "lang": "upper(content)"},
    )
    want = ("BB", "gobb")  # both RHS against the old ('go', 'bb') row
    assert state(ta)[("r1", "b.go", "c1")] == want
    assert state(tb)[("r1", "b.go", "c1")] == want


# ---- expire_snapshots retention floor ---------------------------------------


def _versioned(spark, tmp, n_batches, *, retain_history):
    t = ParquetSnapshotTable(
        spark, str(tmp / "tbl"), n_buckets=2, retain_history=retain_history
    )
    from test_dml import SCHEMA

    t.ensure(SCHEMA)
    for i in range(n_batches):
        t.merge(
            ev(spark, [(10 + i, "I", "r1", f"f{i}.py", "c1", "py", f"v{i}")]),
            job="seed",
            batch_id=i,
        )
    return t


def test_expire_keep_below_retention_is_explicit_shrink(spark, tmp_path):
    """keep < retain_history is the DESIGNED destructive override: the
    window shrinks to keep, reads past it fail with the clean history error
    (never a partial read), and tagged versions survive regardless."""
    t = _versioned(spark, tmp_path, 2, retain_history=3)
    pinned = t._require_manifest()["version"]
    t.create_tag("pin", pinned)  # pin while its files are still live
    for i in range(2, 6):
        t.merge(
            ev(spark, [(10 + i, "I", "r1", f"f{i}.py", "c1", "py", f"v{i}")]),
            job="seed",
            batch_id=i,
        )
    head = t._require_manifest()["version"]
    assert head - pinned >= 4  # pinned sits well outside keep=1
    t.expire_snapshots(keep=1)
    assert t.read(version=head - 1).count() >= 1  # inside keep
    assert t.read(version=pinned).count() >= 1  # tagged: immune
    with pytest.raises(SinkCommitError, match="no history snapshot"):
        t.read(version=head - 2)  # explicitly expired


def test_retain_history_persists_as_table_property(spark, tmp_path):
    """A maintenance verb (or any handle) opened WITHOUT the retention flag
    must honor the writer's persisted window — found live in the verify
    recipe: rebucket from a fresh process GC'd the whole time-travel window
    because retention was a per-process flag."""
    t = _versioned(spark, tmp_path, 3, retain_history=4)
    assert t.properties()["retain_history"] == 4
    # fresh handle, no flag: resolves the persisted property
    t2 = ParquetSnapshotTable(spark, t.root, n_buckets=2)
    assert t2.retain_history == 4
    head = t2._require_manifest()["version"]
    t2.rebucket(4)  # a maintenance commit from the flag-less handle
    for v in range(max(0, head - 3), head + 1):
        t2.read(version=v).count()  # raises if the window was GC'd
    # explicit value on a later handle updates the property at its commit
    t3 = ParquetSnapshotTable(spark, t.root, n_buckets=4, retain_history=6)
    t3.merge(
        ev(spark, [(40, "I", "r1", "z.py", "c1", "py", "zz")]),
        job="seed",
        batch_id=99,
    )
    assert t3.properties()["retain_history"] == 6
    assert ParquetSnapshotTable(spark, t.root).retain_history == 6


# ---- history snapshot is commit-critical ------------------------------------


def test_commit_fails_cleanly_when_history_snapshot_unwritable(spark, tmp_path):
    import shutil

    t = seeded(spark, tmp_path)
    before = t._require_manifest()["version"]
    rows_before = t.read().count()
    hdir = os.path.join(t.root, "history")
    shutil.rmtree(hdir)
    with open(hdir, "w", encoding="utf-8") as fh:  # makedirs now raises
        fh.write("not a directory")
    with pytest.raises(SinkCommitError, match="history snapshot"):
        t.merge(
            ev(spark, [(20, "I", "r9", "x.py", "c1", "py", "xx")]),
            job="seed",
            batch_id=1,
        )
    # the table is untouched and still fully readable
    assert t._require_manifest()["version"] == before
    assert t.read().count() == rows_before
    # restore and retry: the same batch commits
    os.remove(hdir)
    res = t.merge(
        ev(spark, [(20, "I", "r9", "x.py", "c1", "py", "xx")]),
        job="seed",
        batch_id=1,
    )
    assert res.applied
    assert t.read().count() == rows_before + 1


def test_read_version_beyond_head_raises(spark, tmp_path):
    t = seeded(spark, tmp_path)
    head = t._require_manifest()["version"]
    # even if an orphan history snapshot exists for a future version
    # (crash between pre-swap snapshot and swap), it must not be served
    import json

    hpath = os.path.join(t.root, "history", f"manifest.v{head + 1}.json")
    with open(os.path.join(t.root, "manifest.json"), "r", encoding="utf-8") as fh:
        fake = json.load(fh)
    fake["version"] = head + 1
    with open(hpath, "w", encoding="utf-8") as fh:
        json.dump(fake, fh)
    with pytest.raises(SinkCommitError, match="does not exist"):
        t.read(version=head + 1)
    # nor may the orphan leak into timestamp resolution or the commit log
    assert t.version_at_timestamp(int(1e15)) == head
    assert [h["version"] for h in t.history()] == list(range(head + 1))


def test_rollback_and_abort_preserve_table_properties(spark, tmp_path):
    """Properties (retention policy etc.) are table-level metadata, not
    snapshot content: restoring old data must not revert them — else the
    next commit GCs the very window the rollback relies on."""
    t = _versioned(spark, tmp_path, 2, retain_history=None)
    # v-old manifests carry no retain_history property; now persist one
    t2 = ParquetSnapshotTable(spark, t.root, n_buckets=2, retain_history=5)
    t2.merge(
        ev(spark, [(30, "I", "r1", "q.py", "c1", "py", "qq")]),
        job="seed",
        batch_id=50,
    )
    assert t2.properties()["retain_history"] == 5
    # roll back to the newest PRE-property version (its manifest lacks
    # retain_history; its data dirs survived the single retain=5 commit)
    target = t2._require_manifest()["version"] - 1
    t2._retain_history = None  # behave like a flag-less handle from here
    t2.rollback(target)
    assert t2.properties()["retain_history"] == 5
    assert ParquetSnapshotTable(spark, t.root).retain_history == 5


# ---- requeue guard-conflict never deletes unmerged rows ----------------------


def test_requeue_guard_conflict_preserves_quarantine_dir(spark, tmp_path):
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    log_dir = str(tmp_path / "log")
    gen_change_events(spark, 400, with_anomalies=True).write.parquet(log_dir)
    evs = spark.read.parquet(log_dir)
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    qdir = str(tmp_path / "quar")
    job = (
        IngestJob("rq", quarantine_dir=qdir)
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    table.ensure(job.target_schema())
    job.apply_batch(evs, batch_id=5)
    dirs = os.listdir(qdir)
    assert dirs, "anomaly generator produced no quarantine rows"
    # simulate a batch-id namespace regression: the requeue job key has
    # already committed PAST bid 5 (fresh checkpoint / shared quarantine dir)
    table.merge(
        spark.createDataFrame([], EV_SCHEMA), job="rq:requeue:g0", batch_id=99
    )
    out = job.requeue_quarantine(spark)
    assert out[5]["requeued"] == 0
    assert "guard-conflict" in out[5].get("skipped", "")
    # the dir (and its rows) survive for operator intervention
    assert os.listdir(qdir) == dirs


# ---- trigram postings refresh payload-only updates ---------------------------


def test_trigram_payload_only_update_refreshes_postings(spark, tmp_path):
    from test_codesearch import DOCS, _index, _keys, _src

    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    assert _keys(idx.grep("alpha", lang="py")) == {("r1", "a.py", "c1")}
    # lang flips py -> go; content (and therefore the gram set) is unchanged
    src.merge(
        ev(spark, [(5, "U", "r1", "a.py", "c1", "go", "alpha beta")]),
        job="j",
        batch_id=1,
    )
    rep = idx.sync()
    assert rep["mode"] == "incremental" and rep["applied"]
    assert _keys(idx.grep("alpha", lang="go")) == {
        ("r1", "a.py", "c1"),
        ("r2", "c.go", "c1"),
    }
    assert _keys(idx.grep("alpha", lang="py")) == set()
    # and the posting table holds exactly one image per (gram, key)
    dup = (
        idx.table.read()
        .groupBy("gram", "repo", "path", "commit")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0


# ---- gapfill / tumbling twins: floor-mod on pre-epoch timestamps -------------


def test_gapfill_pre_epoch_matches_duckdb_twin(spark, tmp_path):
    import datetime as dt

    import duckdb

    from wprdc_etl_spark.operators.analytics import gapfill_resample, gapfill_sql

    rows = [
        ("u1", dt.datetime(1969, 12, 31, 22, 40, 0), 1.0),
        ("u1", dt.datetime(1969, 12, 31, 23, 59, 59), 2.0),
        ("u1", dt.datetime(1970, 1, 1, 1, 15, 0), 4.0),
        ("u2", dt.datetime(1969, 12, 31, 1, 0, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    pdir = str(tmp_path / "events.parquet")
    df.write.parquet(pdir)
    got = {
        (r["user_id"], r["window_start"], r["n_events"],
         round(float(r["value_sum"]), 4), r["filled"])
        for r in gapfill_resample(
            df, key="user_id", ts="ts", window_seconds=3600, value_col="value"
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pdir}/*.parquet')"
    )
    sql = gapfill_sql(
        "events", key="user_id", ts="ts", window_seconds=3600, value="value"
    )
    want = {
        (k, w, int(n), round(float(v), 4), bool(f))
        for k, w, n, v, f in con.execute(sql).fetchall()
    }
    assert got == want
    # the 23:59:59 event floors to 23:00 (pre-epoch), not to 00:00
    assert ("u1", dt.datetime(1969, 12, 31, 23, 0, 0), 1, 2.0, False) in got


# ---- empty first batch: lag sentinel ----------------------------------------


def test_all_quarantined_first_batch_reports_nothing_applied(spark, tmp_path):
    from wprdc_etl_spark.operators.freshness import lag_report
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    log_dir = str(tmp_path / "log")
    # every row invalid: op='I' with NULL content quarantines under the
    # completeness rule
    (
        gen_change_events(spark, 50, with_anomalies=False)
        .withColumn("op", F.lit("I"))
        .withColumn("content", F.lit(None).cast("string"))
        .write.parquet(log_dir)
    )
    evs = spark.read.parquet(log_dir)
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("empty")
        .source(log_dir)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    table.ensure(job.target_schema())
    job.apply_batch(evs, batch_id=0)
    r = lag_report(evs, table, "empty").collect()[0]
    assert r["applied_seq"] == -1  # was 0 before the fix
    assert r["events_behind"] == 50 and not r["caught_up"]


# ---- txn pending carry is materialized ---------------------------------------


def test_pending_carry_is_materialized_not_recursive(spark, tmp_path):
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    from test_txn import _txn_schema, with_txn_metadata

    n = 210
    log_dir = str(tmp_path / "log")
    with_txn_metadata(
        gen_change_events(spark, n, with_anomalies=False), txn_size=7, n_events=n
    ).write.parquet(log_dir)
    evs = spark.read.parquet(log_dir)

    pend = str(tmp_path / "pend")
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("mat", txn_gate=("txn_id", "txn_total"), txn_pending_dir=pend)
        .source(log_dir, event_schema=_txn_schema())
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    table.ensure(job.target_schema())
    # chunk boundaries at 100/200 tear txn_size=7 transactions
    job.apply_batch(evs.where(F.col("event_sequence") < 100), batch_id=0)
    job.apply_batch(
        evs.where((F.col("event_sequence") >= 100) & (F.col("event_sequence") < 200)),
        batch_id=1,
    )
    # the carry must be a plain scan of the persisted pending dir — not a
    # recursive plan over every earlier micro-batch
    files = job._pending.inputFiles()
    assert files and all(os.path.realpath(pend) in os.path.realpath(f) for f in files)

    # in-memory variant: localCheckpoint truncates the lineage to an RDD scan
    job2 = (
        IngestJob("mat2", txn_gate=("txn_id", "txn_total"))
        .source(log_dir, event_schema=_txn_schema())
        .schema(IngestJob.default_payload_schema())
        .sink(ParquetSnapshotTable(spark, str(tmp_path / "tbl2"), n_buckets=4))
        .build()
    )
    job2._sink.ensure(job2.target_schema())
    job2.apply_batch(evs.where(F.col("event_sequence") < 100), batch_id=0)
    plan = job2._pending._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan and "Relation" not in plan


def test_stream_defaults_pending_dir_under_checkpoint(spark, tmp_path):
    """A gated STREAM without an explicit txn_pending_dir must default the
    carry next to the checkpoint: the in-memory localCheckpoint carry is for
    single-process batch replay only (not executor-loss-safe), and a stream
    restart needs the persisted tail anyway."""
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events

    from test_txn import _txn_schema, with_txn_metadata

    n = 140
    log_dir = str(tmp_path / "log")
    with_txn_metadata(
        gen_change_events(spark, n, with_anomalies=False), txn_size=7, n_events=n
    ).write.parquet(log_dir)
    ckpt = str(tmp_path / "ckpt")
    table = ParquetSnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=4)
    job = (
        IngestJob("defpend", txn_gate=("txn_id", "txn_total"))
        .source(log_dir, event_schema=_txn_schema())
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.start_stream(spark, ckpt).awaitTermination(600)
    assert job.txn_pending_dir == os.path.join(ckpt, "txn_pending")
    assert os.path.isdir(job.txn_pending_dir)
    assert any(d.startswith("b") for d in os.listdir(job.txn_pending_dir))
    # 140 events = exactly 20 complete txns: everything applied
    assert table.read().count() > 0


# ---- WAP staged requires a capable sink --------------------------------------


def test_staged_on_incapable_sink_fails_at_build(spark, tmp_path):
    from wprdc_etl_spark.streaming.job import IngestJob

    class NoWapSink:
        def merge(self, batch_df, *, job, batch_id, counts=None, finalize=None):
            raise AssertionError("must not be reached")

    job = (
        IngestJob("wapless", staged=True)
        .source(str(tmp_path))
        .schema(IngestJob.default_payload_schema())
        .sink(NoWapSink())
    )
    with pytest.raises(IncompletePipelineError, match="staged"):
        job.build()


# ---- merge keys are a persisted table property, not a handle flag ------------


def test_keys_resolve_from_manifest_on_default_handle(spark, tmp_path):
    """A handle opened WITHOUT explicit keys on a custom-keyed table must
    adopt the persisted keys (found live: CLI `--mode update` on a lang-keyed
    dim table raised "merge batch missing key column 'repo'" — and any verb
    that got further would have run LWW/bucket routing on the wrong key)."""
    from pyspark.sql import types as T

    root = str(tmp_path / "dimtbl")
    t = ParquetSnapshotTable(
        spark, root, keys=["lang"], bucket_keys=["lang"], n_buckets=2
    )
    t.ensure(T.StructType([
        T.StructField("lang", T.StringType()),
        T.StructField("family", T.StringType()),
    ]))
    t.merge(
        spark.createDataFrame(
            [(0, "I", "py", "script"), (1, "I", "go", "compiled")],
            "event_sequence long, op string, lang string, family string",
        ),
        job="dim", batch_id=0,
    )
    # fresh default handle (the CLI shape): keys resolve from the manifest
    h = ParquetSnapshotTable(spark, root)
    h.update_where(F.col("lang") == "py", {"family": F.lit("SCRIPT")})
    h2 = ParquetSnapshotTable(spark, root)
    h2.delete_where(F.col("lang") == "go")
    rows = {r["lang"]: r["family"] for r in ParquetSnapshotTable(spark, root).read().collect()}
    assert rows == {"py": "SCRIPT"}
    # and a later merge through the default handle keeps LWW keyed by lang
    h3 = ParquetSnapshotTable(spark, root)
    h3.merge(
        spark.createDataFrame(
            [(100, "U", "py", "scripting")],
            "event_sequence long, op string, lang string, family string",
        ),
        job="dim", batch_id=1,
    )
    rows = {r["lang"]: r["family"] for r in h3.read().collect()}
    assert rows == {"py": "scripting"}
