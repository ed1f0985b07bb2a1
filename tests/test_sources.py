"""A9/A13–A15 parity — CSV extractor semantics + remote staging stub
(reference test_extractors.py / test_connectors.py analogs, FIXTURES.md §5)."""

import pytest

from wprdc_etl_spark.exceptions import InvalidConfigException
from wprdc_etl_spark.schema import BaseSchema, FieldSpec
from wprdc_etl_spark.sources import StagedRemoteConnector, normalize_header, read_csv_source

CSV = """Date,Event Name,Count,Amount,Flag
2016-01-02,gala,3,1.5,true
2016-01-03,fair,,2.25,false
Date,Event Name,Count,Amount,Flag
not-a-date,bad,7,x,true
2016-01-04,picnic,9,0.5,
"""


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "fixture.csv"
    p.write_text(CSV)
    return str(p)


def test_normalize_header():
    assert normalize_header(" Event Name ") == "event_name"
    assert normalize_header("Start-Date") == "start_date"


def test_headers_normalized_and_stray_header_filtered(spark, csv_path):
    df = read_csv_source(spark, csv_path)
    assert df.columns == ["date", "event_name", "count", "amount", "flag"]
    names = [r["event_name"] for r in df.collect()]
    # 4 data rows survive; the repeated header row (IsHeaderException case)
    # is filtered, not raised
    assert sorted(names) == ["bad", "fair", "gala", "picnic"]


def test_csv_values_are_strings(spark, csv_path):
    df = read_csv_source(spark, csv_path)
    assert all(f.dataType.simpleString() == "string" for f in df.schema.fields)


def test_end_to_end_csv_through_schema(spark, csv_path):
    """The reference test_pipeline.py shape: connect → extract → schema →
    (here) count valid/quarantined (SURVEY §6.1)."""
    df = read_csv_source(spark, csv_path)
    sch = BaseSchema(
        fields=[
            FieldSpec("date", "date"),
            FieldSpec("name", "string", load_from="event_name", allow_none=False),
            FieldSpec("count", "integer"),
            FieldSpec("amount", "float"),
            FieldSpec("flag", "boolean", default=False),
        ]
    )
    valid, quarantine = sch.validate(df)
    assert valid.count() == 3  # gala, fair, picnic
    assert quarantine.count() == 1  # the unparseable date row
    got = {r["name"]: r for r in valid.collect()}
    assert got["fair"]["count"] is None  # empty → null
    assert got["picnic"]["flag"] is False  # default fill


def test_provenance_column(spark, csv_path):
    df = read_csv_source(spark, csv_path, with_provenance=True)
    assert df.select("_source_file").distinct().count() == 1


def test_staged_remote_connector_stub(spark, tmp_path):
    conn = StagedRemoteConnector(str(tmp_path / "staging"))
    with pytest.raises(NotImplementedError):
        conn.connect(spark, "http://example.org/data.csv")
    with pytest.raises(InvalidConfigException):
        conn.connect(spark, "")


def test_staged_remote_connector_with_fetcher(spark, tmp_path, csv_path):
    """Injectable fetcher = the A10 staging pattern without network."""
    import shutil

    conn = StagedRemoteConnector(str(tmp_path / "staging"), fetcher=lambda url, local: shutil.copy(csv_path, local))
    df = conn.connect(spark, "http://example.org/fixture.csv")
    assert df.count() == 4


# ---- Spark 4 Python DataSource (A10–A12 distributed remote scan) -----------


def test_remote_datasource_file_transport(spark, tmp_path):
    from wprdc_etl_spark.sources import RemoteTextSource

    p1, p2 = tmp_path / "r1.txt", tmp_path / "r2.txt"
    p1.write_text("x\ny"); p2.write_text("z")
    spark.dataSource.register(RemoteTextSource)
    df = (
        spark.read.format("wprdc_remote")
        .option("urls", f"{p1},{p2}")
        .load()
    )
    rows = {(r["url"], r["line_no"], r["value"]) for r in df.collect()}
    assert rows == {(str(p1), 0, "x"), (str(p1), 1, "y"), (str(p2), 0, "z")}
    # one input partition per URL — executors fetch in parallel
    assert df.rdd.getNumPartitions() == 2


def test_remote_datasource_injected_transport_and_csv_parse(spark):
    from pyspark.sql import functions as F

    from wprdc_etl_spark.sources import RemoteTextSource
    from wprdc_etl_spark.sources.remote_datasource import serialize_transport

    site = {
        "http://example/a.csv": b"id,name\n1,alice\n2,bob",
        "http://example/b.csv": b"id,name\n3,carol",
    }

    # a closure: cloudpickle ships it BY VALUE, so no worker-importable
    # module is needed (the dotted-path form covers the deployed case)
    def fake_http(url: str) -> bytes:
        return site[url]

    spark.dataSource.register(RemoteTextSource)
    df = (
        spark.read.format("wprdc_remote")
        .option("urls", "http://example/a.csv,http://example/b.csv")
        .option("transport_pickle", serialize_transport(fake_http))
        .load()
    )
    parsed = (
        df.where(F.col("line_no") > 0)  # drop per-url header lines
        .select("url", F.from_csv("value", "id INT, name STRING").alias("r"))
        .select("url", "r.*")
    )
    got = {(r["id"], r["name"]) for r in parsed.collect()}
    assert got == {(1, "alice"), (2, "bob"), (3, "carol")}


def test_remote_datasource_inline_and_dotted_path(spark):
    from wprdc_etl_spark.sources import RemoteTextSource

    spark.dataSource.register(RemoteTextSource)
    for transport in ("inline", "wprdc_etl_spark.sources.remote_datasource:_inline_transport"):
        df = (
            spark.read.format("wprdc_remote")
            .option("urls", "inline:h\\nw")
            .option("transport", transport)
            .load()
        )
        assert [r["value"] for r in df.orderBy("line_no").collect()] == ["h", "w"]


def test_remote_datasource_rejects_unknown_transport(spark):
    import pytest as _pytest

    from wprdc_etl_spark.exceptions import InvalidConfigException
    from wprdc_etl_spark.sources.remote_datasource import _RemoteTextReader

    with _pytest.raises(InvalidConfigException):
        _RemoteTextReader({"urls": "http://x", "transport": "smoke-signal"})
    with _pytest.raises(InvalidConfigException):
        _RemoteTextReader({})
