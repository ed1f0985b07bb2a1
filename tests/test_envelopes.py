"""CDC envelope adapters (sources/envelopes.py): Debezium and Maxwell JSON
records → engine change events — op-code mapping, before/after selection,
sequence extraction, wrapper unwrapping, and quarantine of malformed
records. Parsing is one JVM-side from_json; these tests pin the semantics."""

import json

from pyspark.sql import types as T

from wprdc_etl_spark.sources.envelopes import parse_debezium, parse_maxwell

ROW = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["value"])


def _dbz(op, before=None, after=None, lsn=1, ts_ms=1000, wrap=False):
    env = {"before": before, "after": after, "op": op, "ts_ms": ts_ms,
           "source": {"lsn": lsn}}
    return json.dumps({"payload": env} if wrap else env)


def test_debezium_op_mapping_and_row_selection(spark):
    rows = [
        _dbz("c", after={"repo": "r1", "path": "a", "content": "x"}, lsn=1),
        _dbz("r", after={"repo": "r1", "path": "b", "content": "y"}, lsn=2),
        _dbz("u", before={"repo": "r1", "path": "a", "content": "x"},
             after={"repo": "r1", "path": "a", "content": "x2"}, lsn=3),
        _dbz("d", before={"repo": "r1", "path": "b", "content": "y"}, lsn=4),
    ]
    out = parse_debezium(_df(spark, rows), ROW).orderBy("event_sequence").collect()
    assert [(r["event_sequence"], r["op"], r["path"], r["content"]) for r in out] == [
        (1, "I", "a", "x"),
        (2, "I", "b", "y"),
        (3, "U", "a", "x2"),   # update carries the AFTER image
        (4, "D", "b", "y"),    # delete carries the BEFORE image
    ]
    assert out[0]["event_ts"] is not None


def test_debezium_kafka_connect_wrapper(spark):
    rows = [_dbz("c", after={"repo": "r", "path": "p", "content": "c"}, wrap=True)]
    out = parse_debezium(_df(spark, rows), ROW, wrapper=True).collect()
    assert len(out) == 1 and out[0]["op"] == "I" and out[0]["repo"] == "r"


def test_debezium_invalid_records_dropped_or_kept(spark):
    rows = [
        _dbz("c", after={"repo": "r", "path": "p", "content": "c"}, lsn=1),
        None,                      # Kafka compaction tombstone
        "{not json",               # unparseable
        _dbz("x", after={"repo": "r", "path": "q", "content": "d"}, lsn=2),  # unknown op
    ]
    ok = parse_debezium(_df(spark, rows), ROW)
    assert ok.count() == 1
    kept = parse_debezium(_df(spark, rows), ROW, keep_invalid=True)
    errs = [r["_parse_error"] for r in kept.collect()]
    assert sorted(e for e in errs if e) == [
        "tombstone: null value", "unknown op: x", "unparseable envelope",
    ]


def test_debezium_custom_seq_field(spark):
    env = json.dumps({
        "before": None, "after": {"repo": "r", "path": "p", "content": "c"},
        "op": "c", "ts_ms": 5, "source": {"pos": 77},
    })
    out = parse_debezium(_df(spark, [env]), ROW, seq_field="pos").collect()
    assert out[0]["event_sequence"] == 77


def test_debezium_feeds_merge(spark, tmp_path):
    from test_lake_merge import mk_table

    rows = [
        _dbz("c", after={"repo": "r1", "path": "a", "content": "v1"}, lsn=1),
        _dbz("u", after={"repo": "r1", "path": "a", "content": "v2"}, lsn=2),
        _dbz("c", after={"repo": "r2", "path": "b", "content": "w"}, lsn=3),
        _dbz("d", before={"repo": "r2", "path": "b", "content": "w"}, lsn=4),
    ]
    events = parse_debezium(_df(spark, rows), ROW)
    t = mk_table(spark, tmp_path, keys=["repo", "path"])
    t.merge(events.drop("event_ts"), job="dbz", batch_id=0)
    got = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert got == {("r1", "a"): "v2"}


def test_debezium_jsonl_through_full_pipeline(spark, tmp_path):
    """source(envelope='debezium') end to end: a JSONL dir of connector
    records drives the whole pipeline (decode → validate → sha → MERGE) in
    both batch and stream modes, landing the same final state."""
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
    from wprdc_etl_spark.schema import BaseSchema, FieldSpec
    from wprdc_etl_spark.streaming.job import IngestJob

    def row(repo, path, content):
        return {"repo": repo, "path": path, "commit": "c1", "content": content}

    lines = [
        _dbz("c", after=row("r1", "a", "v1"), lsn=1, ts_ms=1_000),
        _dbz("u", after=row("r1", "a", "v2"), lsn=2, ts_ms=2_000),
        _dbz("c", after=row("r2", "b", "w"), lsn=3, ts_ms=3_000),
        _dbz("d", before=row("r2", "b", "w"), lsn=4, ts_ms=4_000),
        "{broken",  # malformed connector record: dropped at decode
    ]
    log = tmp_path / "dbz"
    log.mkdir()
    (log / "part-0.jsonl").write_text("\n".join(lines) + "\n")

    schema = BaseSchema(
        fields=[
            FieldSpec("repo", "string", allow_none=False),
            FieldSpec("path", "string", allow_none=False),
            FieldSpec("commit", "string", allow_none=False),
            FieldSpec("content", "string", strip=False),
        ],
        passthrough=["event_sequence", "event_ts", "op"],
    )

    def run(mode):
        t = ParquetSnapshotTable(
            spark, str(tmp_path / f"tbl_{mode}"),
            keys=["repo", "path", "commit"], n_buckets=2,
        )
        j = (
            IngestJob(f"dbz-{mode}", compute_content_sha=False)
            .source(str(log), envelope="debezium", envelope_options={"seq_field": "lsn"})
            .schema(schema)
            .sink(t)
            .build()
        )
        if mode == "batch":
            j.run_batch(spark, n_chunks=2)
        else:
            j.start_stream(
                spark, str(tmp_path / "ckpt"), available_now=True
            ).awaitTermination()
        return {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}

    expected = {("r1", "a"): "v2"}
    assert run("batch") == expected
    assert run("stream") == expected


def test_maxwell_mapping(spark):
    def mx(typ, data, old=None, xid=1, ts=100):
        return json.dumps({"database": "d", "table": "t", "type": typ,
                           "ts": ts, "xid": xid, "data": data, "old": old})

    rows = [
        mx("insert", {"repo": "r", "path": "a", "content": "x"}, xid=1),
        mx("bootstrap-insert", {"repo": "r", "path": "b", "content": "y"}, xid=2),
        mx("update", {"repo": "r", "path": "a", "content": "x2"},
           old={"content": "x"}, xid=3),
        mx("delete", {"repo": "r", "path": "b", "content": "y"}, xid=4),
        mx("table-create", {}, xid=5),  # DDL records are not row changes
    ]
    out = parse_maxwell(_df(spark, rows), ROW).orderBy("event_sequence").collect()
    assert [(r["event_sequence"], r["op"], r["path"]) for r in out] == [
        (1, "I", "a"), (2, "I", "b"), (3, "U", "a"), (4, "D", "b"),
    ]


# ---- Canal (canal-json) ----------------------------------------------------


def test_canal_batched_rows_ddl_and_errors(spark):
    from wprdc_etl_spark.sources.envelopes import parse_canal

    schema = T.StructType(
        [T.StructField("k", T.StringType()), T.StructField("n", T.LongType())]
    )
    recs = [
        # one record, TWO rows (canal batches) — values stringified
        '{"data": [{"k": "a", "n": "1"}, {"k": "b", "n": "2"}],'
        ' "type": "INSERT", "es": 1700000000000, "id": 1, "isDdl": false}',
        '{"data": [{"k": "a", "n": "3"}],'
        ' "type": "DELETE", "es": 1700000001000, "id": 2, "isDdl": false}',
        '{"data": null, "type": "INSERT", "es": 1, "id": 3, "isDdl": true,'
        ' "sql": "ALTER TABLE t ADD COLUMN x int"}',
        '{"data": [{"k": "z"}], "type": "NOPE", "es": 1, "id": 4, "isDdl": false}',
        "not json at all",
        None,
    ]
    df = spark.createDataFrame([(r,) for r in recs], ["value"])
    ok = parse_canal(df, schema).collect()
    got = {(r["event_sequence"], r["op"], r["k"], r["n"]) for r in ok}
    assert got == {(1, "I", "a", 1), (1, "I", "b", 2), (2, "D", "a", 3)}
    kept = parse_canal(df, schema, keep_invalid=True)
    errs = [r["_parse_error"] for r in kept.collect() if r["_parse_error"]]
    assert "ddl statement" in errs
    assert "unknown op: NOPE" in errs
    assert "unparseable envelope" in errs
    assert "tombstone: null value" in errs


def test_canal_seq_by_event_time(spark):
    from wprdc_etl_spark.sources.envelopes import parse_canal

    schema = T.StructType([T.StructField("k", T.StringType())])
    df = spark.createDataFrame(
        [('{"data": [{"k": "a"}], "type": "UPDATE", "es": 1700000005000,'
          ' "id": 9, "isDdl": false}',)],
        ["value"],
    )
    r = parse_canal(df, schema, seq_expr="es").collect()[0]
    assert r["event_sequence"] == 1700000005000 and r["op"] == "U"


def test_canal_feeds_job_decode_and_merge(spark, tmp_path):
    """IngestJob's envelope dispatch handles 'canal': a canal-json batch
    decodes through _decode and merges to the expected final state."""
    import json as _json

    from test_lake_merge import mk_table

    from wprdc_etl_spark.sources.envelopes import parse_canal

    def rec(typ, rows_, id_):
        return _json.dumps(
            {"data": rows_, "type": typ, "es": 1700000000000 + id_,
             "id": id_, "isDdl": False}
        )

    rows = [
        rec("INSERT", [{"repo": "r1", "path": "a", "commit": "c", "lang": "py",
                        "content": "v1"},
                       {"repo": "r2", "path": "b", "commit": "c", "lang": "py",
                        "content": "w"}], 1),
        rec("UPDATE", [{"repo": "r1", "path": "a", "commit": "c", "lang": "py",
                        "content": "v2"}], 2),
        rec("DELETE", [{"repo": "r2", "path": "b", "commit": "c", "lang": "py",
                        "content": "w"}], 3),
    ]
    df = spark.createDataFrame([(r,) for r in rows], ["value"])
    ROW5 = T.StructType([T.StructField(c, T.StringType())
                         for c in ["repo", "path", "commit", "lang", "content"]])
    events = parse_canal(df, ROW5)
    t = mk_table(spark, tmp_path)
    t.merge(events.drop("event_ts"), job="canal", batch_id=0)
    got = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert got == {("r1", "a"): "v2"}
