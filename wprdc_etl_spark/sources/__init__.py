from wprdc_etl_spark.sources.connectors import (
    StagedRemoteConnector,
    normalize_header,
    parse_json_column,
    read_csv_source,
    read_source,
)
from wprdc_etl_spark.sources.remote_datasource import (
    RemoteTextSource,
    serialize_transport,
)

__all__ = [
    "read_csv_source",
    "read_source",
    "normalize_header",
    "parse_json_column",
    "StagedRemoteConnector",
    "RemoteTextSource",
    "serialize_transport",
]
