"""A9–A15 — sources: file scans, CSV extraction semantics, remote staging.

Parity map (SURVEY.md §3 Table A):

- ``pipeline/connectors.py::FileConnector`` (open + md5 checksum) →
  ``spark.read``; the checksum's descendant is the order-insensitive batch
  ``input_hash`` (operators/fingerprint.py), plus ``input_file_name()`` for
  file-level provenance.
- ``pipeline/extractors.py::CSVExtractor`` →
  ``read_csv_source``: header=True; headers normalized like the reference's
  ``create_schema_headers`` (lowercase, spaces→underscores); a repeated
  header row mid-file (the reference's ``IsHeaderException`` case) is
  filtered declaratively instead of raised per-row.
- ``RemoteFileConnector`` / ``HTTPConnector`` / ``SFTPConnector`` (A10–A12)
  → ``StagedRemoteConnector``: no network in this sandbox, so the pattern is
  fetch-to-staging-dir then read the staged file with Spark. The fetch
  callable is injectable; the default raises, clearly marking the stub.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import InvalidConfigException


def normalize_header(name: str) -> str:
    """Reference header normalization (``CSVExtractor.create_schema_headers``
    [H], exact rule [M]): lowercase, strip, spaces/dashes → underscores."""
    return name.strip().lower().replace(" ", "_").replace("-", "_")


def read_csv_source(
    spark: SparkSession,
    path: str,
    *,
    delimiter: str = ",",
    encoding: str = "utf-8",
    with_provenance: bool = False,
) -> DataFrame:
    """CSV scan with reference extractor semantics (A13–A15).

    All values load as strings (like ``csv.reader``) — typing is the schema
    layer's job (A16), exactly as in the reference where marshmallow coerces
    the extractor's string dicts.
    """
    df = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("encoding", encoding)
        .option("inferSchema", False)
        .csv(path)
    )
    renames = {c: normalize_header(c) for c in df.columns}
    df = df.withColumnsRenamed(renames)
    # Repeated header row mid-file → filter (IsHeaderException, A15): a row
    # is a stray header iff every cell equals its own (normalized) column name.
    cols = df.columns
    is_header = None
    for c in cols:
        cond = F.lower(F.trim(F.coalesce(F.col(c), F.lit("")))).isin(c, c.replace("_", " "))
        is_header = cond if is_header is None else (is_header & cond)
    if is_header is not None:
        df = df.where(~is_header)
    if with_provenance:
        df = df.withColumn("_source_file", F.input_file_name())
    return df


def read_source(spark: SparkSession, path: str, fmt: str = "parquet", **options) -> DataFrame:
    """Generic batch scan (A9). Predicate pushdown / column pruning are
    Catalyst's (SURVEY §5) — callers filter/select on the returned frame."""
    return spark.read.options(**options).format(fmt).load(path)


def parse_json_column(
    df: DataFrame, col: str, schema: "str | object", out_col: str = "_json"
) -> DataFrame:
    """A11 analog (``HTTPConnector`` returning parsed JSON): parse a JSON
    string column into a typed struct with ``from_json`` — JVM-side, no
    Python. ``schema`` is a DDL string ('k BIGINT, name STRING') or a
    StructType; malformed rows yield null struct (quarantine upstream)."""
    return df.withColumn(out_col, F.from_json(F.col(col), schema))


class StagedRemoteConnector:
    """A10–A12 pattern: fetch a remote object into a local staging dir, then
    scan the staged copy with Spark. The fetch step is injectable; in this
    sandbox there is no network, so the default fetcher raises
    ``NotImplementedError`` (clearly-marked stub per the build contract).
    On a real deployment, pass e.g. an HTTP/SFTP fetcher, or replace this
    class with a Spark 4 Python DataSource.
    """

    def __init__(
        self,
        staging_dir: str,
        fetcher: Optional[Callable[[str, str], None]] = None,
    ) -> None:
        self.staging_dir = staging_dir
        self.fetcher = fetcher

    def connect(self, spark: SparkSession, url: str, fmt: str = "csv", **options) -> DataFrame:
        if not url:
            raise InvalidConfigException("empty remote target")
        os.makedirs(self.staging_dir, exist_ok=True)
        local = os.path.join(self.staging_dir, os.path.basename(url) or "staged")
        if self.fetcher is None:
            raise NotImplementedError(
                "no network in this environment: inject fetcher=(url, local_path) -> None "
                "(parity stub for pipeline/connectors.py::RemoteFileConnector/HTTPConnector/SFTPConnector)"
            )
        self.fetcher(url, local)
        if fmt == "csv":
            return read_csv_source(spark, local, **options)
        return read_source(spark, local, fmt, **options)
