"""A10–A12 as a real Spark 4 Python DataSource (no network required).

The reference's ``RemoteFileConnector`` / ``HTTPConnector`` / ``SFTPConnector``
(``pipeline/connectors.py``) fetch one URL on the driver box and hand lines to
the extractor. The distributed re-expression: a ``DataSource`` whose reader
fans URLs out as input partitions — every executor fetches and parses ITS
urls in parallel, so a 10^5-file remote manifest scales with the cluster
instead of serializing through the driver (the StagedRemoteConnector pattern
stays for the single-file case).

Transport is injectable without this module importing any network library.
Spark instantiates the DataSource and its reader in separate Python worker
processes (plan time) and runs ``read()`` on executors, so the transport must
travel through the (string-valued) options; three forms are supported:

- ``transport="file"`` / ``"inline"`` — built-ins: local-path reads (the
  sandbox stand-in and the NFS/staging deployment case) and
  ``inline:<payload>`` URLs (self-contained fixtures).
- ``transport="pkg.module:function"`` — dotted path, imported inside the
  worker; how a deployed HTTP/SFTP/S3 transport package plugs in.
- ``transport_pickle=serialize_transport(fn)`` — a cloudpickled callable for
  closures/test fakes that no worker-importable module provides.

Usage::

    spark.dataSource.register(RemoteTextSource)
    df = (spark.read.format("wprdc_remote")
          .option("urls", "http://a/x.csv,http://b/y.csv")
          .option("transport", "my_transports:http_get")
          .load())
    # → (url string, line_no bigint, value string); parse with from_csv/from_json
"""

from __future__ import annotations

import base64
import importlib
from typing import Callable, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from wprdc_etl_spark.exceptions import InvalidConfigException


def _file_transport(url: str) -> bytes:
    path = url[len("file://"):] if url.startswith("file://") else url
    with open(path, "rb") as fh:
        return fh.read()


def _inline_transport(url: str) -> bytes:
    """``inline:<payload>`` — the payload IS the content (self-contained
    fixtures; '\\n' escapes become newlines)."""
    if not url.startswith("inline:"):
        raise InvalidConfigException(f"inline transport got non-inline url {url!r}")
    return url[len("inline:"):].replace("\\n", "\n").encode("utf-8")


_BUILTIN: dict[str, Callable[[str], bytes]] = {
    "file": _file_transport,
    "inline": _inline_transport,
}


def serialize_transport(fetch: Callable[[str], bytes]) -> str:
    """→ a string for ``.option("transport_pickle", ...)``: ships an arbitrary
    (cloudpicklable) fetch callable to the workers."""
    from pyspark import cloudpickle

    return base64.b64encode(cloudpickle.dumps(fetch)).decode("ascii")


def _resolve_transport(options: dict) -> Callable[[str], bytes]:
    blob = options.get("transport_pickle")
    if blob:
        from pyspark import cloudpickle

        return cloudpickle.loads(base64.b64decode(blob))
    name = options.get("transport", "file")
    if name in _BUILTIN:
        return _BUILTIN[name]
    if ":" in name:
        mod, _, fn = name.partition(":")
        try:
            return getattr(importlib.import_module(mod), fn)
        except (ImportError, AttributeError) as e:
            raise InvalidConfigException(f"cannot import transport {name!r}: {e}") from e
    raise InvalidConfigException(
        f"unknown transport {name!r}; use a built-in ({sorted(_BUILTIN)}), a "
        f"'module:function' dotted path, or option transport_pickle="
        f"serialize_transport(fn)"
    )


class _UrlPartition(InputPartition):
    def __init__(self, url: str) -> None:
        self.url = url


class _RemoteTextReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        urls = [u.strip() for u in (options.get("urls") or "").split(",") if u.strip()]
        if not urls:
            raise InvalidConfigException(
                "wprdc_remote needs option 'urls' (comma-separated remote targets)"
            )
        self.urls = urls
        self._fetch = _resolve_transport(options)
        self.encoding = options.get("encoding", "utf-8")

    def partitions(self) -> list[_UrlPartition]:
        # one partition per URL: fetch parallelism = min(n_urls, cores)
        return [_UrlPartition(u) for u in self.urls]

    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        data = self._fetch(partition.url)
        for i, line in enumerate(data.decode(self.encoding).splitlines()):
            yield (partition.url, i, line)


class RemoteTextSource(DataSource):
    """``format("wprdc_remote")`` — line-oriented remote text scan."""

    @classmethod
    def name(cls) -> str:
        return "wprdc_remote"

    def schema(self) -> str:
        return "url string, line_no bigint, value string"

    def reader(self, schema) -> _RemoteTextReader:
        return _RemoteTextReader(self.options)
