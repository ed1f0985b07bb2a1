from wprdc_etl_spark.sources.connectors import (
    StagedRemoteConnector,
    normalize_header,
    parse_json_column,
    read_csv_source,
    read_source,
)

__all__ = [
    "read_csv_source",
    "read_source",
    "normalize_header",
    "parse_json_column",
    "StagedRemoteConnector",
]
