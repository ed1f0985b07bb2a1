"""Marshmallow-style validation layer (SURVEY A16/A17, B5)."""

import datetime

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import InvalidConfigException
from wprdc_etl_spark.schema import BaseSchema, FieldSpec


@pytest.fixture(scope="module")
def raw(spark):
    # Reference-style CSV rows (FIXTURES.md §5): strings in, typing is ours.
    rows = [
        ("2016-01-02", "  Alice ", "3", "1.5", "true"),
        ("2016-01-03", "Bob", "", "2.25", "false"),   # empty count → null
        ("not-a-date", "Carl", "7", "x", "true"),     # bad date + bad amount
        (None, None, "9", "0.5", None),               # nulls
    ]
    return spark.createDataFrame(rows, ["Date", "Name", "Count", "Amount", "Flag"])


def fixture_schema():
    return BaseSchema(
        fields=[
            FieldSpec("date", "date", load_from="Date"),
            FieldSpec("name", "string", load_from="Name", allow_none=False),
            FieldSpec("count", "integer", load_from="Count"),
            FieldSpec("amount", "double" if False else "float", load_from="Amount"),
            FieldSpec("flag", "boolean", load_from="Flag", default=False),
        ]
    )


def test_coercion_types_and_values(spark, raw):
    valid, quarantine = fixture_schema().validate(raw)
    got = {r["name"]: r for r in valid.collect()}
    assert set(got) == {"Alice", "Bob"}
    a = got["Alice"]
    assert a["date"] == datetime.date(2016, 1, 2)
    assert a["name"] == "Alice"  # stripped
    assert a["count"] == 3 and isinstance(a["count"], int)
    assert abs(a["amount"] - 1.5) < 1e-9
    assert a["flag"] is True
    assert got["Bob"]["count"] is None  # empty string → null, not error


def test_quarantine_reports_errors(spark, raw):
    _, quarantine = fixture_schema().validate(raw)
    q = quarantine.collect()
    assert len(q) == 2
    errs = {tuple(sorted(r["_errors"])) for r in q}
    assert any("date: uncastable to date" in e for errs_t in errs for e in errs_t)
    assert any("name: required" in e for errs_t in errs for e in errs_t)


def test_default_fill(spark, raw):
    valid, _ = fixture_schema().validate(raw)
    flags = dict(valid.select("name", "flag").collect())
    assert flags["Alice"] is True and flags["Bob"] is False


def test_allowed_set(spark):
    df = spark.createDataFrame([("py",), ("klingon",), ("  go ",)], ["lang"])
    sch = BaseSchema(fields=[FieldSpec("lang", "string", allowed=["py", "go"])])
    valid, quarantine = sch.validate(df)
    assert sorted(r["lang"] for r in valid.collect()) == ["go", "py"]  # trimmed
    assert quarantine.count() == 1


def test_pandas_udf_coerce_hook(spark):
    """The marshmallow custom-field analog: vectorized coercion via Arrow."""
    df = spark.createDataFrame([("Python",), ("PY",), ("golang",)], ["lang"])
    aliases = {"python": "py", "py": "py", "golang": "go"}

    def normalize(s):
        return s.str.lower().map(lambda v: aliases.get(v, v) if v is not None else None)

    sch = BaseSchema(fields=[FieldSpec("lang", "string", coerce=normalize, allowed=["py", "go"])])
    valid, quarantine = sch.validate(df)
    assert sorted(r["lang"] for r in valid.collect()) == ["go", "py", "py"]
    assert quarantine.count() == 0


def test_missing_input_column_uses_default(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    sch = BaseSchema(fields=[FieldSpec("a", "integer"), FieldSpec("b", "string", default="x")])
    valid, _ = sch.validate(df)
    assert valid.collect()[0]["b"] == "x"


def test_passthrough_and_order(spark):
    df = spark.createDataFrame([(1, "a", "9")], ["event_sequence", "op", "n"])
    sch = BaseSchema(fields=[FieldSpec("n", "integer")], passthrough=["event_sequence", "op"])
    valid, _ = sch.validate(df)
    assert valid.columns == ["event_sequence", "op", "n"]


def test_serialize_to_ckan_fields():
    fields = fixture_schema().serialize_to_ckan_fields()
    assert fields == [
        {"id": "date", "type": "date"},
        {"id": "name", "type": "text"},
        {"id": "count", "type": "int"},
        {"id": "amount", "type": "float"},
        {"id": "flag", "type": "bool"},
    ]
    cap = fixture_schema().serialize_to_ckan_fields(capitalize=True)
    assert cap[0]["id"] == "Date"


def test_serialize_to_ddl():
    ddl = fixture_schema().serialize_to_ddl()
    assert "date date" in ddl and "count bigint" in ddl and "flag boolean" in ddl


def test_unknown_type_rejected():
    with pytest.raises(InvalidConfigException):
        FieldSpec("x", "decimal")


def test_uncastable_with_default_is_error_not_silently_defaulted(spark):
    """A non-null garbage value must be flagged uncastable even when the
    field has a default — defaults fill genuine nulls only."""
    df = spark.createDataFrame(
        [("banana",), (None,), ("true",)], ["Flag"]
    )
    schema = BaseSchema(fields=[FieldSpec("flag", "boolean", load_from="Flag", default=False)])
    valid, quarantine = schema.validate(df)
    assert valid.count() == 2  # null→default(False) and 'true'
    bad = quarantine.collect()
    assert len(bad) == 1
    assert "flag: uncastable to boolean" in bad[0]["_errors"][0]
    vals = sorted((r["flag"] for r in valid.collect()))
    assert vals == [False, True]


def test_time_field_type(spark):
    df = spark.createDataFrame([("13:45:02",), ("bogus",)], ["T"])
    schema = BaseSchema(fields=[FieldSpec("t", "time", load_from="T")])
    valid, quarantine = schema.validate(df)
    assert valid.count() == 1 and quarantine.count() == 1
    assert valid.schema["t"].dataType.typeName().startswith("time")
    assert schema.serialize_to_ckan_fields() == [{"id": "t", "type": "time"}]


# ---- drop_column (subtractive schema evolution) -----------------------------


def _dc_table(spark, tmp):
    from wprdc_etl_spark.plans.lake import ParquetSnapshotTable
    from tests.test_lake_merge import SCHEMA, ev

    t = ParquetSnapshotTable(spark, str(tmp / "tbl"), n_buckets=4, retain_history=4)
    t.ensure(SCHEMA)
    t.merge(ev(spark, [(0, "I", "r1", "a", "c1", "py", "v1"),
                       (1, "I", "r2", "b", "c2", "go", "w1")]), job="j", batch_id=0)
    return t


def test_drop_column_metadata_only_and_time_travel(spark, tmp_path):
    import pytest as _pytest
    from wprdc_etl_spark.exceptions import SinkCommitError
    from tests.test_lake_merge import ev

    t = _dc_table(spark, tmp_path)
    pre = t.current_version()
    t.drop_column("lang")
    assert "lang" not in t.read().columns
    assert {r["content"] for r in t.read().collect()} == {"v1", "w1"}
    # pre-drop versions still show the column (history manifests carry schemas)
    assert "lang" in t.read(version=pre).columns
    # validation: keys and unknowns rejected
    with _pytest.raises(SinkCommitError, match="key/bucket"):
        t.drop_column("repo")
    with _pytest.raises(SinkCommitError, match="does not exist"):
        t.drop_column("nope")


def test_drop_column_tombstone_blocks_resurrection(spark, tmp_path):
    """A lagging producer still carrying the dropped column has it ignored,
    and the name can NEVER re-enter via additive evolution — old files
    still hold the bytes, so a re-add would resurrect stale values."""
    from tests.test_lake_merge import ev

    t = _dc_table(spark, tmp_path)
    t.drop_column("lang")
    # batch still carries lang = 'STALE' — ignored, not evolved back in
    t.merge(ev(spark, [(2, "U", "r1", "a", "c1", "STALE", "v2")]), job="j", batch_id=1)
    assert "lang" not in t.read().columns
    assert {r["content"] for r in t.read().collect()} == {"v2", "w1"}
    # compact() physically sheds the bytes and the column stays gone
    t.compact()
    assert "lang" not in t.read().columns
    assert {r["content"] for r in t.read().collect()} == {"v2", "w1"}


def test_drop_column_rejected_when_referenced(spark, tmp_path):
    import pytest as _pytest
    from wprdc_etl_spark.exceptions import SinkCommitError

    t = _dc_table(spark, tmp_path)
    t.add_constraint("content_nonnull", "content IS NOT NULL")
    with _pytest.raises(SinkCommitError, match="constraint 'content_nonnull'"):
        t.drop_column("content")
    t.drop_constraint("content_nonnull")
    t.add_generated_column("content_len", "length(content)")
    with _pytest.raises(SinkCommitError, match="generated 'content_len'"):
        t.drop_column("content")
    with _pytest.raises(SinkCommitError, match="drop_generated_column first"):
        t.drop_column("content_len")
    t.drop_generated_column("content_len")
    t.drop_column("content")  # now fine
    assert "content" not in t.read().columns
