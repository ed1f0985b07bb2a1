"""Partial-image (column-patch) merge — operators/patch.py.

Semantics under test (module doc of operators/patch.py):
U-NULL-in-patch-column carries forward; I is a full image (resets);
D resets the patch base to the all-null image; normalize-then-merge is
batch-split invariant; payload never rides the carry-forward window sort.
"""

import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.operators.patch import normalize_patches, patch_merge
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("event_sequence", T.LongType()),
    ]
)


def _table(spark, tmp_path, name="t"):
    return ParquetSnapshotTable(
        spark, str(tmp_path / name), keys=["k"], bucket_keys=["k"], n_buckets=4
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(table):
    return {
        r["k"]: (r["a"], r["b"])
        for r in table.read().select("k", "a", "b").collect()
    }


def test_patch_carries_from_table_live_row(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(t, _batch(spark, [("k1", "a0", "b0", "I", 1)]), batch_id=1)
    patch_merge(t, _batch(spark, [("k1", None, "b1", "U", 2)]), batch_id=2)
    assert _state(t) == {"k1": ("a0", "b1")}


def test_patch_chain_within_one_batch(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(
        t,
        _batch(
            spark,
            [
                ("k1", "a0", "b0", "I", 1),
                ("k1", None, "b1", "U", 2),
                ("k1", "a2", None, "U", 3),
            ],
        ),
        batch_id=1,
    )
    assert _state(t) == {"k1": ("a2", "b1")}


def test_insert_resets_patch_base(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(t, _batch(spark, [("k1", "a0", "b0", "I", 1)]), batch_id=1)
    # a full image with a REAL null — the old a0 must not leak through
    patch_merge(t, _batch(spark, [("k1", None, "b1", "I", 2)]), batch_id=2)
    assert _state(t) == {"k1": (None, "b1")}


def test_delete_resets_patch_base_to_all_null(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(t, _batch(spark, [("k1", "a0", "b0", "I", 1)]), batch_id=1)
    patch_merge(t, _batch(spark, [("k1", None, None, "D", 2)]), batch_id=2)
    assert _state(t) == {}
    # a patch after the delete resurrects with ONLY the patched column
    patch_merge(t, _batch(spark, [("k1", None, "b3", "U", 3)]), batch_id=3)
    assert _state(t) == {"k1": (None, "b3")}


def test_unknown_key_patch_yields_nulls(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.ensure(T.StructType([f for f in SCHEMA.fields if f.name in ("k", "a", "b")]))
    patch_merge(t, _batch(spark, [("kx", None, "b0", "U", 1)]), batch_id=1)
    assert _state(t) == {"kx": (None, "b0")}


def test_non_patch_columns_keep_full_image_semantics(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(t, _batch(spark, [("k1", "a0", "b0", "I", 1)]), batch_id=1)
    # only 'a' is a patch column: U's NULL b is a real null
    patch_merge(
        t, _batch(spark, [("k1", None, None, "U", 2)]), batch_id=2, patch_cols=["a"]
    )
    assert _state(t) == {"k1": ("a0", None)}


EVENTS = [
    ("k1", "a0", "b0", "I", 1),
    ("k2", "x0", "y0", "I", 2),
    ("k1", None, "b1", "U", 3),
    ("k2", None, None, "D", 4),
    ("k1", "a2", None, "U", 5),
    ("k2", "x1", None, "U", 6),
    ("k3", None, "z0", "U", 7),
    ("k1", None, None, "D", 8),
    ("k1", None, "b3", "U", 9),
]
FINAL = {"k1": (None, "b3"), "k2": ("x1", None), "k3": (None, "z0")}


@pytest.mark.parametrize("splits", [[9], [3, 3, 3], [1] * 9, [5, 4]])
def test_batch_split_invariance(spark, tmp_path, splits):
    t = _table(spark, tmp_path, name=f"t{len(splits)}")
    i = 0
    for bid, n in enumerate(splits):
        patch_merge(t, _batch(spark, EVENTS[i : i + n]), batch_id=bid + 1)
        i += n
    assert _state(t) == FINAL


def test_exactly_once_guard_applies(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(t, _batch(spark, [("k1", "a0", "b0", "I", 1)]), batch_id=1)
    r = patch_merge(t, _batch(spark, [("k1", "aX", None, "U", 2)]), batch_id=1)
    assert not r.applied and _state(t) == {"k1": ("a0", "b0")}


def test_patch_cols_must_be_nonkey_payload(spark, tmp_path):
    t = _table(spark, tmp_path)
    with pytest.raises(SinkCommitError):
        normalize_patches(t, _batch(spark, [("k1", "a", "b", "I", 1)]), ["k"])
    with pytest.raises(SinkCommitError):
        normalize_patches(t, _batch(spark, [("k1", "a", "b", "I", 1)]), ["nope"])


def test_payload_not_in_carry_forward_window_sort(spark, tmp_path):
    """Plan shape: the carry-forward runs on narrow metadata; the wide
    payload column must never appear in the Window operator's input or the
    Sort feeding it (the repo's late-materialization discipline)."""
    t = _table(spark, tmp_path)
    patch_merge(
        t, _batch(spark, [("k1", "BIGPAYLOAD" * 50, "b0", "I", 1)]), batch_id=1
    )
    out = normalize_patches(
        t, _batch(spark, [("k1", None, "b1", "U", 2)]), patch_cols=["a", "b"]
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    win_ids = re.findall(r"\((\d+)\) Window", plan)
    assert win_ids, plan
    for wid in win_ids:
        m = re.search(rf"\({wid}\) Window\nInput \[\d+\]: \[([^\]]*)\]", plan)
        assert m, plan
        cols = m.group(1)
        assert re.search(r"\ba#", cols) is None and re.search(r"\bb#", cols) is None, plan
    for m in re.finditer(r"\(\d+\) Sort\nInput \[\d+\]: \[([^\]]*)\]", plan):
        if "_set_" in m.group(1) or "_src" in m.group(1):
            assert re.search(r"\ba#", m.group(1)) is None, plan


def test_normalized_rows_are_full_images(spark, tmp_path):
    t = _table(spark, tmp_path)
    patch_merge(t, _batch(spark, [("k1", "a0", "b0", "I", 1)]), batch_id=1)
    out = normalize_patches(t, _batch(spark, [("k1", None, "b1", "U", 2)]))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r == {
        "k": "k1", "a": "a0", "b": "b1", "op": "U", "event_sequence": 2
    }
    assert out.columns == ["k", "a", "b", "op", "event_sequence"]


def test_ingest_job_patch_mode_end_to_end(spark, tmp_path):
    """IngestJob(patch=True): partial images normalize against the live
    table BEFORE validation — a carried image passes the content rule, an
    un-carryable patch keeps its NULL and quarantines."""
    import datetime as dt

    from wprdc_etl_spark.streaming.job import IngestJob, event_struct

    ts = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        (1, ts, "I", "r", "p", "c1", "py", "content-A"),
        # patch: lang only; content carries from seq 1 across the chunk split
        (2, ts, "U", "r", "p", "c1", "go", None),
        # patch on an unknown key: content stays NULL -> quarantined
        (3, ts, "U", "r", "p", "c2", "js", None),
    ]
    log = str(tmp_path / "log")
    spark.createDataFrame(rows, event_struct()).repartitionByRange(
        2, "event_sequence"
    ).write.parquet(log)
    table = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"),
        keys=["repo", "path", "commit"], n_buckets=4,
    )
    job = (
        IngestJob("patch-e2e", patch=True)
        .source(log)
        .schema(IngestJob.default_payload_schema())
        .sink(table)
        .build()
    )
    job.run_batch(spark, n_chunks=2)
    got = {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in table.read().collect()
    }
    assert got == {("r", "p", "c1"): ("go", "content-A")}


def test_ingest_job_patch_mode_streaming(spark, tmp_path):
    """patch=True rides foreachBatch unchanged: an availableNow drain over a
    partial-image log lands the same carried state batch replay does, and a
    restart is a no-op (checkpoint + guard)."""
    import datetime as dt

    from wprdc_etl_spark.streaming.job import IngestJob, event_struct

    ts = dt.datetime(2024, 1, 1, 9, 0)
    rows = [
        (1, ts, "I", "r", "p", "c1", "py", "content-A"),
        (2, ts, "U", "r", "p", "c1", "go", None),        # patch lang
        (3, ts, "U", "r", "p", "c1", None, "content-B"),  # patch content
    ]
    log = str(tmp_path / "slog")
    spark.createDataFrame(rows, event_struct()).repartitionByRange(
        3, "event_sequence"
    ).write.parquet(log)
    # The patch contract requires per-key in-order delivery across batches
    # (the binlog guarantee). Spark's file source admits files oldest-mtime
    # first, and the three part files were written concurrently — pin each
    # file's mtime to its min sequence so trigger order IS sequence order
    # (a real binlog segment directory has exactly this property).
    import glob
    import os

    import pyarrow.parquet as pq

    base = 1_700_000_000
    for f in glob.glob(os.path.join(log, "part-*")):
        seqs = pq.read_table(f, columns=["event_sequence"])["event_sequence"]
        ts = base + 10 * int(min(s.as_py() for s in seqs))
        os.utime(f, (ts, ts))
    table = ParquetSnapshotTable(
        spark, str(tmp_path / "stbl"),
        keys=["repo", "path", "commit"], n_buckets=4,
    )

    def job():
        return (
            IngestJob("patch-stream", patch=True, max_files_per_trigger=1)
            .source(log)
            .schema(IngestJob.default_payload_schema())
            .sink(table)
            .build()
        )

    ckpt = str(tmp_path / "ckpt")
    job().start_stream(spark, ckpt).awaitTermination()
    got = {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in table.read().collect()
    }
    assert got == {("r", "p", "c1"): ("go", "content-B")}
    v = table.current_version()
    job().start_stream(spark, ckpt).awaitTermination()  # drained restart
    assert table.current_version() == v


def test_patch_merge_sql_builder():
    from wprdc_etl_spark.plans import iceberg as ice

    sql = ice.patch_merge_sql(
        "t",
        keys=["k"],
        batch_cols=["k", "a", "b", "_seq", "_op"],
        table_cols=["k", "a", "b", "c", "_seq", "_op"],
        patch_cols=["a"],
    )
    # patch column: NULL-means-unchanged coalesce — but NEVER against a
    # tombstoned target (delete reset the patch base); D resets to NULL
    assert "WHEN s._op = 'U' AND t._op <> 'D' THEN COALESCE(s.a, t.a)" in sql
    assert "t.a = CASE WHEN s._op = 'D' THEN NULL" in sql
    # non-patch batch column: full image, D resets
    assert "t.b = CASE WHEN s._op = 'D' THEN NULL ELSE s.b END" in sql
    # table-only column nulled; internal LWW columns verbatim
    assert "t.c = NULL" in sql
    assert "t._seq = s._seq" in sql and "t._op = s._op" in sql
    # LWW condition identical to merge_sql
    assert "s._seq > t._seq OR (s._seq = t._seq AND s._op >= t._op)" in sql


def test_patch_merge_sql_absolute_images_never_coalesce():
    from wprdc_etl_spark.plans import iceberg as ice

    sql = ice.patch_merge_sql(
        "t",
        keys=["k"],
        batch_cols=["k", "a", "_seq", "_op", "_abs"],
        table_cols=["k", "a", "_seq", "_op"],
        patch_cols=["a"],
        absolute_col="_abs",
    )
    assert "s._op = 'U' AND t._op <> 'D' AND s._abs = FALSE THEN COALESCE(s.a, t.a)" in sql
    # _abs is merge-condition plumbing, never inserted into the table
    assert "INSERT (k, a, _seq, _op)" in sql and "s._abs)" not in sql


def test_batch_local_normalize_and_absolute_flag(spark, tmp_path):
    """use_baseline=False: carry within the batch only; _abs marks images
    whose chain hit an I/D (their NULLs are real — the Iceberg MERGE must
    not coalesce them against the target)."""
    t = _table(spark, tmp_path)
    rows = [
        # k1: lone partial U — relative image, b carries nothing in-batch
        ("k1", None, "b1", "U", 1),
        # k2: I then patch — absolute, a carries from the in-batch I
        ("k2", "a0", "b0", "I", 2),
        ("k2", None, "b2", "U", 3),
        # k3: D then patch — absolute with the delete-reset (a stays null)
        ("k3", None, None, "D", 4),
        ("k3", None, "b3", "U", 5),
    ]
    out = {
        r["k"]: (r["a"], r["b"], r["op"], r["_abs"])
        for r in normalize_patches(
            t, _batch(spark, rows), use_baseline=False, emit_absolute=True
        ).collect()
        if r["op"] == "U"
    }
    assert out["k1"] == (None, "b1", "U", False)
    assert out["k2"] == ("a0", "b2", "U", True)
    assert out["k3"] == (None, "b3", "U", True)


def _iceberg_patch_merge_emulator(target, reduced, patch_cols):
    """Pure-Python twin of patch_merge_sql's matched/not-matched rules:
    target: {key: {col: val, '_seq': n, '_op': op}}."""
    for row in reduced:
        k = row["k"]
        t = target.get(k)
        if t is None:
            target[k] = {c: row[c] for c in ("a", "b")} | {
                "_seq": row["_seq"], "_op": row["_op"]
            }
            continue
        if not (row["_seq"] > t["_seq"] or (row["_seq"] == t["_seq"] and row["_op"] >= t["_op"])):
            continue
        for c in ("a", "b"):
            if row["_op"] == "D":
                t[c] = None
            elif (
                c in patch_cols
                and row["_op"] == "U"
                and t["_op"] != "D"
                and not row["_abs"]
            ):
                t[c] = row[c] if row[c] is not None else t[c]
            else:
                t[c] = row[c]
        t["_seq"], t["_op"] = row["_seq"], row["_op"]
    return {
        k: (v["a"], v["b"]) for k, v in target.items() if v["_op"] != "D"
    }


def test_iceberg_patch_protocol_equals_lake_patch_merge(spark, tmp_path):
    """The Iceberg patch protocol (batch-local normalize + guarded-COALESCE
    MERGE, emulated in pure Python since no jar ships in-sandbox) must land
    the same final state as the lake sink's baseline-fed patch_merge for
    the same chunked event stream."""
    from wprdc_etl_spark.plans.lake import _lww_reduce

    t = _table(spark, tmp_path)
    splits = [[3, 3, 3], [5, 4]]
    for si, split in enumerate(splits):
        # lake path
        lt = _table(spark, tmp_path, name=f"lake{si}")
        target: dict = {}
        i = 0
        for bid, n in enumerate(split):
            chunk = _batch(spark, EVENTS[i : i + n])
            i += n
            patch_merge(lt, chunk, batch_id=bid + 1)
            # iceberg protocol: batch-local normalize -> LWW reduce -> emulated MERGE
            norm = normalize_patches(t, chunk, use_baseline=False, emit_absolute=True)
            shaped = (
                norm.withColumn("_seq", F.col("event_sequence").cast("long"))
                .withColumn("_op", F.col("op"))
                .drop("op", "event_sequence")
            )
            reduced = [r.asDict() for r in _lww_reduce(shaped, ["k"]).collect()]
            _iceberg_patch_merge_emulator(target, reduced, patch_cols={"a", "b"})
        live = {
            k: (v["a"], v["b"]) for k, v in target.items() if v["_op"] != "D"
        }
        assert live == _state(lt) == FINAL
