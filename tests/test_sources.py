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
