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
