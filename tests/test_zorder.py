"""Z-order clustering (functions/zorder.py + compact(zorder_by=...)):
curve correctness vs the pure-Python twin, state preservation of the
layout rewrite, and the actual data-skipping property — every clustered
column's local value spread is bounded along the curve, not just the
leading column's as with lexicographic clustering."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.functions.zorder import (
    zorder_key,
    zorder_key_py,
    zorder_stats,
)
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from test_lake_merge import SCHEMA, ev


# ---- curve vs the Python twin ------------------------------------------------


def test_key_matches_python_twin_numeric_and_string(spark):
    rows = [
        (0, "alpha", 1.5),
        (7, "beta", -2.0),
        (100, "alpha2", 0.0),
        (55, "", 99.9),
        (None, None, None),
        (3, "zz", 12.25),
    ]
    df = spark.createDataFrame(rows, "a long, s string, d double")
    cols = ["a", "s", "d"]
    stats = zorder_stats(df, cols)
    got = (
        df.withColumn("z", zorder_key(df, cols, stats))
        .select("a", "s", "d", "z")
        .collect()
    )
    dtypes = [T.LongType(), T.StringType(), T.DoubleType()]
    st = [stats[c] for c in cols]
    for r in got:
        assert r["z"] == zorder_key_py([r["a"], r["s"], r["d"]], dtypes, st)


def test_key_is_monotonic_per_column_with_others_fixed(spark):
    """Along one axis (others fixed) the Morton code is non-decreasing —
    the property that makes range predicates skippable."""
    rows = [(x, 5) for x in range(0, 100, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    stats = {"x": (0.0, 99.0), "y": (0.0, 99.0)}
    zs = [
        r["z"]
        for r in df.withColumn("z", zorder_key(df, ["x", "y"], stats))
        .orderBy("x")
        .collect()
    ]
    assert zs == sorted(zs)


def test_degenerate_and_unknown_columns(spark):
    df = spark.createDataFrame([(1, 1), (2, 1)], "a long, b long")
    stats = zorder_stats(df, ["a", "b"])
    assert stats["b"] == (1.0, 1.0)  # constant column -> degenerate bounds
    zs = {r["z"] for r in df.withColumn("z", zorder_key(df, ["a", "b"], stats)).collect()}
    assert len(zs) == 2  # 'a' still discriminates
    with pytest.raises(ValueError, match="not in the data"):
        zorder_stats(df, ["nope"])


# ---- compact(zorder_by=) is a state-preserving layout rewrite ----------------


def _seeded(spark, tmp, n=400, **kw):
    kw.setdefault("n_buckets", 2)
    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), **kw)
    t.ensure(SCHEMA)
    langs = ["py", "go", "rs", "js"]
    rows = [
        (i, "I", f"r{i % 37}", f"f{i}.x", "c1", langs[i % 4], f"body-{i}")
        for i in range(n)
    ]
    t.merge(ev(spark, rows), job="seed", batch_id=0)
    return t


def test_zorder_compact_preserves_state_and_folds_deltas(spark, tmp_path):
    t = _seeded(spark, tmp_path, write_mode="mor")
    t.merge(
        ev(spark, [(1000, "U", "r1", "f1.x", "c1", "py", "patched"),
                   (1001, "D", "r2", "f2.x", "c1", None, None)]),
        job="seed", batch_id=1,
    )
    before = {tuple(r) for r in t.read().collect()}
    pre_v = t.current_version()
    v = t.compact(zorder_by=["repo", "lang"])
    assert v == pre_v + 1
    after = {tuple(r) for r in t.read().collect()}
    assert after == before
    # no _zkey column leaked into the files
    assert "_zkey" not in t.read().columns
    man = t._require_manifest()
    assert all(len(t._dirs_of(man, b)) == 1 for b in man["buckets"])


def test_zorder_rejects_unknown_column(spark, tmp_path):
    t = _seeded(spark, tmp_path, n=20)
    with pytest.raises(ValueError, match="not in the data"):
        t.compact(zorder_by=["no_such_col"])


# ---- the locality win over lexicographic clustering --------------------------


def _chunk_spreads(table, col, chunk=64):
    """Per-chunk distinct-count of ``col`` along each file's physical row
    order — a row-group-granularity proxy independent of parquet block
    sizing. Lower = tighter stats = more skippable."""
    import os

    spreads = []
    man = table._require_manifest()
    for b in man["buckets"]:
        for rel in table._dirs_of(man, b):
            d = os.path.join(table.root, rel)
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                vals = pq.read_table(os.path.join(d, name), columns=[col])[
                    col
                ].to_pylist()
                for i in range(0, len(vals), chunk):
                    part = vals[i : i + chunk]
                    if len(part) >= chunk // 2:
                        spreads.append(len(set(part)))
    return spreads


def test_zorder_bounds_trailing_column_spread(spark, tmp_path):
    """Lexicographic clustering by (repo, lang) leaves lang cycling its
    full range inside any run spanning multiple repos; the Morton layout
    bounds BOTH columns' local spread. Compare lang's per-chunk distinct
    count along the physical row order of the two layouts."""
    lex = _seeded(
        spark, tmp_path / "lex", n=2000,
        cluster_within_buckets=["repo", "lang"],
    )
    lex.compact()  # rewrite under the lexicographic layout
    zt = _seeded(spark, tmp_path / "z", n=2000)
    zt.compact(zorder_by=["repo", "lang"])

    lex_spread = _chunk_spreads(lex, "lang")
    z_spread = _chunk_spreads(zt, "lang")
    assert lex_spread and z_spread
    avg_lex = sum(lex_spread) / len(lex_spread)
    avg_z = sum(z_spread) / len(z_spread)
    # 37 repos x 4 langs in 64-row chunks: lex interleaves all 4 langs in
    # nearly every chunk; the curve keeps most chunks at 1-2 langs
    assert avg_z < avg_lex, (avg_z, avg_lex)
    assert avg_z <= 2.5, avg_z
    # and the states are identical — layout only
    assert {tuple(r) for r in lex.read().collect()} == {
        tuple(r) for r in zt.read().collect()
    }


# ---- the layout persists as a table property ---------------------------------


def test_zorder_property_persists_through_maintenance(spark, tmp_path):
    """compact(zorder_by=) stamps the property in the same commit; later
    plain compact()/rebucket() (the scheduled-optimize shape) default to it
    so auto-maintenance never silently destroys the layout; zorder_by=[]
    clears it."""
    t = _seeded(spark, tmp_path, n=2000)
    t.compact(zorder_by=["repo", "lang"])
    assert t.properties()["zorder_by"] == ["repo", "lang"]
    before = {tuple(r) for r in t.read().collect()}

    # a fresh default handle (scheduler shape) compacts and KEEPS the curve
    h = ParquetSnapshotTable(spark, t.root)
    h.compact()
    spread = _chunk_spreads(h, "lang")
    assert sum(spread) / len(spread) <= 2.5
    h.rebucket(4)
    spread = _chunk_spreads(h, "lang")
    assert sum(spread) / len(spread) <= 2.5
    assert {tuple(r) for r in h.read().collect()} == before

    # explicit [] clears the property and the next rewrite is unclustered
    h.compact(zorder_by=[])
    assert not h.properties().get("zorder_by")
    assert {tuple(r) for r in h.read().collect()} == before


def test_drop_column_shrinks_zorder_property(spark, tmp_path):
    """Dropping a z-ordered column must shrink the persisted layout in the
    same commit — otherwise the next scheduled compact()/rebucket() fails
    resolving the stale property."""
    t = _seeded(spark, tmp_path, n=200)
    t.compact(zorder_by=["repo", "lang"])
    t.drop_column("lang")
    assert t.properties()["zorder_by"] == ["repo"]
    t.compact()  # must not raise; layout continues on the survivor
    t.rebucket(4)
    assert "lang" not in t.read().columns
    assert t.read().count() == 200


# ---- review-pass pins: reserved names, bit width, CLI parsing ----------------


def test_reserved_column_names_rejected(spark, tmp_path):
    """A user column named _zkey (or any engine-internal name) would be
    silently dropped by the clustered write path — rejected at create time
    and at additive evolution instead."""
    from wprdc_etl_spark.exceptions import SinkCommitError
    from wprdc_etl_spark.plans.lake import plan_schema_changes

    bad = T.StructType(SCHEMA.fields + [T.StructField("_zkey", T.LongType())])
    t = ParquetSnapshotTable(spark, str(tmp_path / "bad"), n_buckets=2)
    with pytest.raises(SinkCommitError, match="reserved"):
        t.ensure(bad)
    # evolution path: an existing table must reject a batch introducing one
    t2 = _seeded(spark, tmp_path, n=10)
    evil = ev(spark, [(100, "I", "rX", "fX", "c1", "py", "x")]).withColumn(
        "_zkey", F.lit(1)
    )
    with pytest.raises(SinkCommitError, match="reserved"):
        t2.merge(evil, job="seed", batch_id=9)
    # and the dry-run pre-flight flags it blocking
    rep = {r["column"]: r for r in plan_schema_changes(
        SCHEMA, evil.drop("op", "event_sequence").schema,
        keys=["repo", "path", "commit"],
    )}
    assert rep["_zkey"]["kind"] == "reserved_name" and rep["_zkey"]["blocking"]


def test_bits_width_validated_in_both_engines(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    stats = {"x": (0.0, 9.0), "y": (0.0, 9.0)}
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(df, ["x", "y"], stats, bits_per_col=32)
    with pytest.raises(ValueError, match="exceeds 63"):
        zorder_key_py([1, 2], [T.LongType()] * 2, [stats["x"], stats["y"]],
                      bits_per_col=32)
    # 31 x 2 = 62 bits is the legal ceiling
    df.withColumn("z", zorder_key(df, ["x", "y"], stats, bits_per_col=31)).collect()


def test_cli_zorder_arg_parsing():
    from wprdc_etl_spark.__main__ import _parse_zorder

    assert _parse_zorder(None) is None            # keep persisted layout
    assert _parse_zorder("none") == []            # clear it
    assert _parse_zorder("NONE") == []
    assert _parse_zorder("") == []
    assert _parse_zorder("  ") == []
    assert _parse_zorder(" repo, lang ") == ["repo", "lang"]  # stripped


# ---- opt-in write-time curve maintenance (liquid-clustering shape) -----------


def test_zorder_on_write_clusters_new_deltas_from_persisted_stats(spark, tmp_path):
    """After OPTIMIZE fits the curve, a zorder_on_write handle sorts each
    merge's bucket writes by the SAME key built from the persisted bounds
    (manifest literals — no stats scan), so MOR deltas stay clustered
    between compactions. Off by default; state identical either way."""
    t = _seeded(spark, tmp_path, n=400)
    t.compact(zorder_by=["repo", "lang"])
    assert set(t.properties()["zorder_stats"]) == {"repo", "lang"}

    langs = ["py", "go", "rs", "js"]
    delta_rows = [
        (10_000 + i, "U", f"r{i % 37}", f"f{i}.x", "c1", langs[i % 4], f"v2-{i}")
        for i in range(0, 400, 2)
    ]
    w = ParquetSnapshotTable(
        spark, t.root, write_mode="mor", zorder_on_write=True
    )
    w.merge(ev(spark, delta_rows), job="seed", batch_id=1)
    man = w._require_manifest()
    # the fresh delta dirs (chain length > 1) must be curve-clustered
    import os

    delta_spread = []
    for b in man["buckets"]:
        for rel in w._dirs_of(man, b)[1:]:  # deltas only
            d = os.path.join(w.root, rel)
            for name in sorted(os.listdir(d)):
                if name.endswith(".parquet"):
                    vals = pq.read_table(os.path.join(d, name), columns=["lang"])[
                        "lang"
                    ].to_pylist()
                    for i in range(0, len(vals), 32):
                        part = vals[i : i + 32]
                        if len(part) >= 16:
                            delta_spread.append(len(set(part)))
    assert delta_spread, "MOR merge produced no delta dirs"
    assert sum(delta_spread) / len(delta_spread) <= 2.0, delta_spread
    # and the merged STATE is exactly what a plain handle produces
    plain = _seeded(spark, tmp_path / "plain", n=400)
    plain.merge(ev(spark, delta_rows), job="seed", batch_id=1)
    assert {tuple(r) for r in w.read().collect()} == {
        tuple(r) for r in plain.read().collect()
    }


def test_zorder_on_write_noop_without_fitted_layout(spark, tmp_path):
    """The flag is inert until a layout is fitted — no property, no sort,
    merges behave identically (incl. clamping safety when values drift
    outside the fitted bounds on a later merge)."""
    t = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"), n_buckets=2, zorder_on_write=True
    )
    t.ensure(SCHEMA)
    t.merge(ev(spark, [(1, "I", "r1", "a", "c1", "py", "A")]), job="j", batch_id=0)
    assert t.read().count() == 1
    t.compact(zorder_by=["repo"])
    # out-of-bounds repo on the next merge: clamps, still lands correctly
    t.merge(ev(spark, [(2, "I", "zzz-way-out", "b", "c1", "go", "B")]),
            job="j", batch_id=1)
    got = {r["repo"] for r in t.read().collect()}
    assert got == {"r1", "zzz-way-out"}
