"""CDC envelope adapters — Debezium / Maxwell JSON change records → the
engine's change-event shape (event_sequence, event_ts, op, *row columns).

Reference tie-in: wprdc-etl's extractors (pipeline/extractors.py CSV/JSON)
assume the upstream hands over full files; real CDC feeds arrive as JSON
*envelopes* emitted by log-tailing connectors (Debezium for
Postgres/MySQL/..., Maxwell for MySQL). These adapters are the missing
extract step for that deployment: one ``from_json`` per record — JVM-side,
whole-stage-codegen, no Python in the path — then a pure projection onto the
envelope contract the rest of the engine (validate → dedup → MERGE) already
speaks. At 100 TB the adapter cost is the JSON parse itself; there is no
shuffle, no UDF, and the parse columns prune like any other projection.

Shapes handled:

- **Debezium** (``{"before": {...}, "after": {...}, "source": {...}, "op":
  "c|r|u|d", "ts_ms": 123}``): op 'c' (create) and 'r' (snapshot read) map
  to 'I', 'u' → 'U', 'd' → 'D'; the row is ``after`` except for deletes,
  which carry ``before``. ``event_sequence`` comes from a caller-named
  source field (``lsn`` for Postgres, ``pos``/``sequence`` for MySQL — the
  connector's total order); ``event_ts`` from ``ts_ms``. The optional Kafka
  Connect wrapper (``{"schema": ..., "payload": {...}}``) unwraps with
  ``wrapper=True``.
- **Maxwell** (``{"type": "insert|bootstrap-insert|update|delete", "data":
  {...}, "old": {...}, "ts": sec, "xid": n}``): ``data`` always carries the
  row (Maxwell deletes carry the deleted row in ``data``); sequence defaults
  to ``xid``.

Malformed records and Kafka compaction tombstones (null/unparseable values,
unknown op codes) are **dropped, not thrown** — the CDC analog of the
validate step's quarantine-not-exceptions rule; pass ``keep_invalid=True``
to get them back with a ``_parse_error`` column for a quarantine sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEBEZIUM_OPS = {"c": "I", "r": "I", "u": "U", "d": "D"}
_MAXWELL_OPS = {"insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D"}


def _op_map(col: Column, mapping: dict[str, str]) -> Column:
    out = F.lit(None).cast("string")
    expr = None
    for raw, eng in mapping.items():
        expr = F.when(col == raw, F.lit(eng)) if expr is None else expr.when(col == raw, F.lit(eng))
    return expr.otherwise(out) if expr is not None else out


def debezium_envelope_schema(
    row_schema: T.StructType,
    source_fields: dict[str, str] | None = None,
    *,
    wrapper: bool = False,
) -> T.StructType:
    """The from_json schema for a Debezium change record. ``source_fields``
    types the connector's ``source`` block (only the fields you read —
    from_json ignores the rest); default exposes ``lsn`` and ``sequence``."""
    source_fields = source_fields or {"lsn": "long", "sequence": "string"}
    env = T.StructType(
        [
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField(k, T._parse_datatype_string(v))
                        for k, v in source_fields.items()
                    ]
                ),
            ),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
        ]
    )
    if wrapper:
        return T.StructType([T.StructField("payload", env)])
    return env


def parse_debezium(
    df: DataFrame,
    row_schema: T.StructType,
    *,
    value_col: str = "value",
    seq_field: str = "lsn",
    source_fields: dict[str, str] | None = None,
    wrapper: bool = False,
    keep_invalid: bool = False,
) -> DataFrame:
    """Debezium JSON records → engine change events.

    Output: ``event_sequence`` (long, from ``source.<seq_field>``),
    ``event_ts`` (timestamp, from ``ts_ms``), ``op`` ('I'|'U'|'D') and every
    ``row_schema`` column (``after`` for I/U, ``before`` for D). Invalid
    records (null value, parse failure, unknown op) are dropped unless
    ``keep_invalid``, in which case they survive with ``_parse_error`` set
    and null event columns — route them to quarantine.
    """
    if source_fields is None:
        source_fields = {seq_field: "long"}
    elif seq_field not in source_fields:
        source_fields = {**source_fields, seq_field: "long"}
    schema = debezium_envelope_schema(row_schema, source_fields, wrapper=wrapper)
    parsed = F.from_json(F.col(value_col), schema)
    env = parsed["payload"] if wrapper else parsed
    op = _op_map(env["op"], _DEBEZIUM_OPS)
    row = F.when(op == "D", env["before"]).otherwise(env["after"])
    out = df.select(
        env["source"][seq_field].cast("long").alias("event_sequence"),
        F.timestamp_millis(env["ts_ms"]).alias("event_ts"),
        op.alias("op"),
        *[row[f.name].alias(f.name) for f in row_schema.fields],
        _error_col(F.col(value_col), env["op"], op).alias("_parse_error"),
    )
    if keep_invalid:
        return out
    return out.where(F.col("_parse_error").isNull()).drop("_parse_error")


def parse_maxwell(
    df: DataFrame,
    row_schema: T.StructType,
    *,
    value_col: str = "value",
    seq_expr: str = "xid",
    keep_invalid: bool = False,
) -> DataFrame:
    """Maxwell JSON records → engine change events. ``data`` always carries
    the row (Maxwell deletes put the deleted row in ``data``); sequence
    defaults to ``xid`` (pass e.g. ``seq_expr='ts'`` for feeds without
    transaction ids)."""
    schema = T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("data", row_schema),
            T.StructField("old", row_schema),
        ]
    )
    env = F.from_json(F.col(value_col), schema)
    op = _op_map(env["type"], _MAXWELL_OPS)
    out = df.select(
        env[seq_expr].cast("long").alias("event_sequence"),
        F.timestamp_seconds(env["ts"]).alias("event_ts"),
        op.alias("op"),
        *[env["data"][f.name].alias(f.name) for f in row_schema.fields],
        _error_col(F.col(value_col), env["type"], op).alias("_parse_error"),
    )
    if keep_invalid:
        return out
    return out.where(F.col("_parse_error").isNull()).drop("_parse_error")


def _error_col(raw: Column, raw_op: Column, mapped_op: Column) -> Column:
    """Why a record is invalid (null = valid): tombstone / unparseable /
    unknown op code. from_json yields a null struct on malformed input, so
    'unparseable' is detectable without a _corrupt_record side channel."""
    return (
        F.when(raw.isNull(), F.lit("tombstone: null value"))
        .when(raw_op.isNull(), F.lit("unparseable envelope"))
        .when(mapped_op.isNull(), F.concat(F.lit("unknown op: "), raw_op))
    )


_CANAL_OPS = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}


def parse_canal(
    df: DataFrame,
    row_schema: T.StructType,
    *,
    value_col: str = "value",
    seq_expr: str = "id",
    keep_invalid: bool = False,
) -> DataFrame:
    """Canal (Alibaba canal-json) records → engine change events. Canal
    BATCHES rows: ``data`` is an ARRAY of row objects per record (deletes
    carry the deleted rows in ``data``), values stringified — so the parse
    is from_json → explode_outer (narrow, no shuffle) → per-field cast to
    ``row_schema``. ``event_sequence`` defaults to ``id`` (the connector's
    monotone batch id — record-level order, like Maxwell's xid; pass
    ``seq_expr='es'`` to order by source event time instead). DDL records
    (``isDdl: true``) are schema statements, not row changes — dropped (or
    kept with ``_parse_error='ddl statement'`` under ``keep_invalid``)."""
    schema = T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("isDdl", T.BooleanType()),
            T.StructField("data", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
            T.StructField("old", T.ArrayType(T.MapType(T.StringType(), T.StringType()))),
        ]
    )
    env = F.from_json(F.col(value_col), schema)
    tmp = df.select(
        env.alias("_env"), F.col(value_col).alias("_raw")
    ).select("_env", "_raw", F.explode_outer("_env.data").alias("_rowmap"))
    op = _op_map(F.col("_env.type"), _CANAL_OPS)
    err = (
        F.when(F.col("_raw").isNull(), F.lit("tombstone: null value"))
        .when(F.col("_env.type").isNull(), F.lit("unparseable envelope"))
        .when(F.col("_env.isDdl"), F.lit("ddl statement"))
        .when(op.isNull(), F.concat(F.lit("unknown op: "), F.col("_env.type")))
        .when(F.col("_rowmap").isNull(), F.lit("no row payload"))
    )
    out = tmp.select(
        F.col(f"_env.{seq_expr}").cast("long").alias("event_sequence"),
        F.timestamp_millis(F.col("_env.es")).alias("event_ts"),
        op.alias("op"),
        *[
            F.col("_rowmap").getItem(f.name).cast(f.dataType).alias(f.name)
            for f in row_schema.fields
        ],
        err.alias("_parse_error"),
    )
    if keep_invalid:
        return out
    return out.where(F.col("_parse_error").isNull()).drop("_parse_error")
