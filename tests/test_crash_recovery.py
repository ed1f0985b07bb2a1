"""Exactly-once across crash points (SURVEY §8.3 #2, §4.4).

The commit protocol writes data files → lineage files → atomic manifest
rename. A crash anywhere before the rename leaves the published state
untouched; re-running the batch converges to the same final table.
"""

import pytest
from pyspark.sql import types as T

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
from wprdc_etl_spark.exceptions import SinkCommitError

from tests.test_lake_merge import EV_SCHEMA, SCHEMA, ev, state  # reuse helpers


class CrashBefore(Exception):
    pass


def crash_table(spark, root, crash_at: str):
    """A table whose commit crashes at a chosen point."""
    t = ParquetSnapshotTable(spark, root, n_buckets=4)

    if crash_at == "manifest":
        orig = t._swap_manifest

        def boom(man, **kw):
            if man["version"] > 0:  # let ensure() through
                raise CrashBefore("crash before manifest swap")
            return orig(man, **kw)

        t._swap_manifest = boom
    elif crash_at == "lineage":
        def boom2(*a, **k):
            raise CrashBefore("crash before lineage write")

        t._write_lineage = boom2
    return t


@pytest.mark.parametrize("crash_at", ["manifest", "lineage"])
def test_crash_then_retry_converges(spark, tmp_path, crash_at):
    root = str(tmp_path / "tbl")
    good = ParquetSnapshotTable(spark, root, n_buckets=4)
    good.ensure(SCHEMA)
    batch0 = ev(spark, [(0, "I", "r", "p", "c", "py", "x")])
    good.merge(batch0, job="j", batch_id=0)

    bad = crash_table(spark, root, crash_at)
    batch1 = ev(spark, [(1, "U", "r", "p", "c", "py", "y"), (2, "I", "r2", "p2", "c2", "go", "z")])
    with pytest.raises(CrashBefore):
        bad.merge(batch1, job="j", batch_id=1)

    # published state untouched by the crashed attempt
    fresh = ParquetSnapshotTable(spark, root, n_buckets=4)
    assert state(fresh) == {("r", "p", "c"): "x"}
    assert fresh.last_committed_batch("j") == 0

    # retry (the restart path) applies cleanly and GCs the orphans
    r = fresh.merge(batch1, job="j", batch_id=1)
    assert r.applied
    assert state(fresh) == {("r", "p", "c"): "y", ("r2", "p2", "c2"): "z"}
    assert fresh.last_committed_batch("j") == 1


def test_orphan_dirs_gced_after_crash(spark, tmp_path):
    import os

    root = str(tmp_path / "tbl")
    good = ParquetSnapshotTable(spark, root, n_buckets=4)
    good.ensure(SCHEMA)
    good.merge(ev(spark, [(0, "I", "r", "p", "c", "py", "x")]), job="j", batch_id=0)

    bad = crash_table(spark, root, "manifest")
    with pytest.raises(CrashBefore):
        bad.merge(ev(spark, [(1, "U", "r", "p", "c", "py", "y")]), job="j", batch_id=1)
    orphans = {n for n in os.listdir(os.path.join(root, "data")) if not n.startswith(".")}
    # crashed attempt left files (attempt dirs are token-suffixed: v2_w<tok>)
    assert any(n.startswith("v2") for n in orphans)

    fresh = ParquetSnapshotTable(spark, root, n_buckets=4)
    fresh.merge(ev(spark, [(1, "U", "r", "p", "c", "py", "y")]), job="j", batch_id=1)
    fresh.merge(ev(spark, [(2, "I", "r3", "p3", "c3", "js", "w")]), job="j", batch_id=2)
    man = fresh._read_manifest()
    live = {rel.split("/")[1] for b in man["buckets"] for rel in fresh._dirs_of(man, b)}
    on_disk = set(os.listdir(os.path.join(root, "data")))
    assert live <= on_disk
    # the crashed v2 must be gone once a later commit GC'd it
    assert all(d in live for d in on_disk)


def test_iceberg_gated_absent_in_sandbox(spark):
    """The Iceberg drop-in must refuse cleanly without the runtime jar
    (SURVEY §8.1 step 3: capability probe)."""
    from wprdc_etl_spark.plans.iceberg import IcebergTable, iceberg_available

    assert iceberg_available(spark) is False
    with pytest.raises(SinkCommitError, match="Iceberg runtime not on the classpath"):
        IcebergTable(spark, "db.t")
