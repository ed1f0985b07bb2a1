"""Atomic multi-table publish (plans/txn_commit.py): 2PC over WAP chains.

Load-bearing properties: staged data on N tables becomes visible via one
decide-then-commit protocol; a crash at ANY point between per-table publishes
drives to all-visible on recover(); before the decision the transaction can
abort to none-visible; the coordinator never drags in commits staged after
its intent was recorded."""

import json
import os

import pytest
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import InvalidConfigException, SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.plans.txn_commit import MultiTablePublish

SCHEMA = T.StructType(
    [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)
EV_SCHEMA = T.StructType(
    [T.StructField("event_sequence", T.LongType()), T.StructField("op", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)


def ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def mk(spark, tmp, name):
    t = ParquetSnapshotTable(spark, str(tmp / name), n_buckets=4)
    t.ensure(SCHEMA)
    return t


B_A = [(10, "I", "r1", "a.py", "c1", "py", "aa")]
B_B = [(11, "I", "r2", "b.go", "c1", "go", "bb")]


def _stage(spark, ta, tb):
    ta.merge(ev(spark, B_A), job="j", batch_id=0, staged=True)
    tb.merge(ev(spark, B_B), job="j", batch_id=0, staged=True)


def test_publish_all_happy_path(spark, tmp_path):
    ta, tb = mk(spark, tmp_path, "a"), mk(spark, tmp_path, "b")
    _stage(spark, ta, tb)
    assert ta.read().count() == 0 and tb.read().count() == 0
    co = MultiTablePublish(str(tmp_path / "co"))
    out = co.publish_all({"a": ta, "b": tb})
    assert set(out) == {"a", "b"}
    assert ta.read().count() == 1 and tb.read().count() == 1
    assert ta.staged_versions() == [] and tb.staged_versions() == []
    assert co.pending() == []
    # intent retained as .done for audit
    assert any(n.endswith(".done.json") for n in os.listdir(co.dir))


def test_crash_between_publishes_recovers_to_all(spark, tmp_path):
    ta, tb = mk(spark, tmp_path, "a"), mk(spark, tmp_path, "b")
    _stage(spark, ta, tb)
    co = MultiTablePublish(str(tmp_path / "co"))

    real_publish = tb.publish
    tb.publish = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    with pytest.raises(OSError):
        co.publish_all({"a": ta, "b": tb})
    # half-landed: decision is durable, one table visible, one not
    assert ta.read().count() == 1
    assert tb.read().count() == 0
    assert len(co.pending()) == 1

    # a new transaction must not leapfrog the unfinished one
    with pytest.raises(SinkCommitError, match="unfinished"):
        co.publish_all({"a": ta, "b": tb})
    # nor may it abort backwards past the decision
    with pytest.raises(SinkCommitError, match="recover"):
        co.abort_all({"a": ta, "b": tb})

    tb.publish = real_publish
    assert co.recover({"a": ta, "b": tb}) == [0]
    assert tb.read().count() == 1
    assert co.pending() == []
    # recovery is idempotent
    assert co.recover({"a": ta, "b": tb}) == []
    assert ta.read().count() == 1 and tb.read().count() == 1


def test_recover_never_publishes_later_staged_commits(spark, tmp_path):
    """Commits staged AFTER the intent was recorded stay staged."""
    ta, tb = mk(spark, tmp_path, "a"), mk(spark, tmp_path, "b")
    _stage(spark, ta, tb)
    co = MultiTablePublish(str(tmp_path / "co"))

    tb.publish = lambda *a, **k: (_ for _ in ()).throw(OSError("crash"))
    with pytest.raises(OSError):
        co.publish_all({"a": ta, "b": tb})
    del tb.publish  # restore the class method

    # a later batch lands staged on b while the txn is still unfinished
    tb.merge(
        ev(spark, [(12, "I", "r2", "c.go", "c1", "go", "cc")]),
        job="j", batch_id=1, staged=True,
    )
    co.recover({"a": ta, "b": tb})
    got = {r["path"] for r in tb.read().collect()}
    assert got == {"b.go"}  # c.go staged after the decision: still invisible
    assert tb.staged_versions() != []


def test_abort_all_restores_none_visible(spark, tmp_path):
    ta, tb = mk(spark, tmp_path, "a"), mk(spark, tmp_path, "b")
    ta.merge(ev(spark, [(1, "I", "r0", "base.py", "c0", "py", "00")]), job="j", batch_id=9)
    _stage(spark, ta, tb)
    co = MultiTablePublish(str(tmp_path / "co"))
    co.abort_all({"a": ta, "b": tb})
    assert {r["path"] for r in ta.read().collect()} == {"base.py"}
    assert tb.read().count() == 0
    assert ta.staged_versions() == [] and tb.staged_versions() == []


def test_publish_to_version_prefix(spark, tmp_path):
    """publish(to_version=) publishes a chain prefix; the rest stays staged."""
    t = mk(spark, tmp_path, "t")
    t.merge(ev(spark, B_A), job="j", batch_id=0, staged=True)
    v1 = t.current_version()
    t.merge(ev(spark, [(20, "I", "r9", "z.py", "c1", "py", "zz")]),
            job="j", batch_id=1, staged=True)
    head = t.current_version()
    t.publish(to_version=v1)
    assert {r["path"] for r in t.read().collect()} == {"a.py"}
    assert t.published_version() == v1
    assert t.staged_versions() != []
    # beyond-head target is a clean error
    with pytest.raises(SinkCommitError, match="head"):
        t.publish(to_version=head + 99)
    # full publish closes the chain
    t.publish()
    assert {r["path"] for r in t.read().collect()} == {"a.py", "z.py"}
    assert t.staged_versions() == []


def test_publish_all_rejects_nonstageable_sink(spark, tmp_path):
    co = MultiTablePublish(str(tmp_path / "co"))
    with pytest.raises(InvalidConfigException):
        co.publish_all({"x": object()})
    with pytest.raises(InvalidConfigException):
        co.publish_all({})


def test_interrupted_intent_write_is_scrapped(spark, tmp_path, monkeypatch):
    """A failure while persisting the intent leaves no decision behind —
    the transaction can still abort to none-visible."""
    ta = mk(spark, tmp_path, "a")
    ta.merge(ev(spark, B_A), job="j", batch_id=0, staged=True)
    co = MultiTablePublish(str(tmp_path / "co"))
    monkeypatch.setattr(json, "dump", lambda *a, **k: (_ for _ in ()).throw(OSError("disk")))
    with pytest.raises(OSError):
        co.publish_all({"a": ta})
    monkeypatch.undo()
    assert co.pending() == []
    assert ta.read().count() == 0
    co.abort_all({"a": ta})
    assert ta.staged_versions() == []


def test_fault_sweep_every_crash_point_recovers_to_all(spark, tmp_path):
    """Systematic sweep: inject a crash at EVERY per-table publish step of a
    3-table transaction (before any, between each, after all). Whatever the
    crash point, recover() converges to all-visible with each table at its
    recorded head — the atomic-durability contract, exhaustively."""
    for crash_at in range(4):  # fail before the (crash_at+1)-th publish; 3 = none
        base = tmp_path / f"s{crash_at}"
        base.mkdir()
        tables = {}
        for i, name in enumerate(("t0", "t1", "t2")):
            t = mk(spark, base, name)
            t.merge(
                ev(spark, [(10 + i, "I", f"r{i}", f"f{i}.py", "c1", "py", f"v{i}")]),
                job="j", batch_id=0, staged=True,
            )
            tables[name] = t
        co = MultiTablePublish(str(base / "co"))

        calls = {"n": 0}
        reals = {n: t.publish for n, t in tables.items()}

        def crashing(real):
            def _pub(*a, **k):
                if calls["n"] == crash_at:
                    raise OSError(f"crash at step {crash_at}")
                calls["n"] += 1
                return real(*a, **k)
            return _pub

        for n, t in tables.items():
            t.publish = crashing(reals[n])
        if crash_at < 3:
            with pytest.raises(OSError):
                co.publish_all(tables)
            assert len(co.pending()) == 1
        else:
            co.publish_all(tables)
            assert co.pending() == []
        for n, t in tables.items():
            t.publish = reals[n]
        co.recover(tables)
        for i, (n, t) in enumerate(sorted(tables.items())):
            rows_ = {r["path"] for r in t.read().collect()}
            assert rows_ == {f"f{i}.py"}, (crash_at, n, rows_)
            assert t.staged_versions() == []
        assert co.pending() == []


def test_torn_intent_claim_is_ignored_and_txid_not_reused(spark, tmp_path):
    """A hard kill mid-decision leaves only a .tmp claim: recovery ignores
    it (never decided ⇒ the transaction is abortable), and its txid is
    never reused by the next coordinator."""
    ta = mk(spark, tmp_path, "a")
    ta.merge(ev(spark, B_A), job="j", batch_id=0, staged=True)
    co = MultiTablePublish(str(tmp_path / "co"))
    # simulate the torn claim: garbage bytes under the O_EXCL-claimed name
    with open(os.path.join(co.dir, "commit-0.json.tmp"), "w") as f:
        f.write('{"txid": 0, "tab')  # torn mid-write
    assert co.pending() == []
    assert co.recover({"a": ta}) == []
    co.publish_all({"a": ta})
    assert ta.read().count() == 1
    # the completed txn took txid 1, not the torn claim's 0
    assert os.path.exists(os.path.join(co.dir, "commit-1.done.json"))
    assert not os.path.exists(os.path.join(co.dir, "commit-0.done.json"))
