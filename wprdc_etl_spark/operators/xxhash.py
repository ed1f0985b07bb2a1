"""Pure-Python XXH64 matching Spark's ``xxhash64(...)`` expression bit-for-bit.

Lets the driver compute a row's bucket id without launching a Spark job
(point lookups, routing, manifest tooling). Spark's expression is the public
XXH64 algorithm (Yann Collet) with seed 42, applied per column with the
running hash as the next column's seed; longs hash via the fixed-size
``hashLong`` path, strings/binary via the byte-stream path. Parity is locked
by tests/test_operators.py::test_xxhash64_matches_spark.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte fixed-size path."""
    h = (seed + _P5 + 8) & _M
    k = (_rotl((value & _M) * _P2 & _M, 31) * _P1) & _M
    h ^= k
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte fixed-size path."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte stream (Spark's string/binary path)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = (((h ^ _round(0, v)) * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _M, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    return _fmix(h)


# Spark dispatches by COLUMN TYPE, not value width: Byte/Short/Int/Date take
# the 4-byte hashInt path, Long/Timestamp the 8-byte hashLong path. A Python
# int carries no such distinction, so callers with non-long numeric columns
# must pass the Spark type names (``types=``) or the hash silently diverges.
_INT_TYPES = {"tinyint", "smallint", "int", "integer", "date"}
_LONG_TYPES = {"bigint", "long", "timestamp", "timestamp_ntz"}


def _hash_typed(value, spark_type: str, seed: int) -> int:
    import datetime as _dt

    t = spark_type.lower()
    if t == "date" and isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
        # Spark hashes DateType as its internal days-since-epoch int32
        value = (value - _dt.date(1970, 1, 1)).days
    elif t in ("timestamp", "timestamp_ntz") and isinstance(value, _dt.datetime):
        # internal form is epoch MICROseconds (int64); naive datetimes are
        # taken as UTC (= the session timezone everywhere in this engine),
        # aware ones convert exactly via timedelta division (no float)
        if value.tzinfo is not None:
            epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        else:
            epoch = _dt.datetime(1970, 1, 1)
        value = (value - epoch) // _dt.timedelta(microseconds=1)
    if t in _INT_TYPES:
        return xxh64_int(int(value), seed)
    if t in _LONG_TYPES:
        return xxh64_long(int(value), seed)
    if t == "boolean":
        return xxh64_int(1 if value else 0, seed)
    if t == "float":
        import struct

        bits = struct.unpack("<i", struct.pack("<f", float(value)))[0]
        return xxh64_int(bits, seed)
    if t == "double":
        import struct

        bits = struct.unpack("<q", struct.pack("<d", float(value)))[0]
        return xxh64_long(bits, seed)
    if t == "string":
        return xxh64_bytes(str(value).encode("utf-8"), seed)
    if t == "binary":
        return xxh64_bytes(bytes(value), seed)
    raise TypeError(f"unsupported Spark type for xxhash64 parity: {spark_type!r}")


def spark_xxhash64(*values, seed: int = 42, types: list[str] | None = None) -> int:
    """The value of Spark's ``F.xxhash64(*cols)`` for one row: each column
    hashes with the running hash as seed; nulls are skipped (Spark keeps the
    previous hash for null inputs). Returns a SIGNED 64-bit int like Spark.

    ``types`` (Spark ``simpleString`` names, aligned with ``values``) selects
    the per-type hash path — REQUIRED for 4-byte numeric columns (int/short/
    byte/date hash via hashInt, not hashLong) and for float/double. Without
    it, only string/bytes/bool/long-typed Python values are accepted; a bare
    Python int is assumed to be a Spark LongType (raising here would break
    the common (repo, path) string case for nothing — strings are unambiguous).
    """
    h = seed
    for i, v in enumerate(values):
        if v is None:
            continue
        if types is not None:
            h = _hash_typed(v, types[i], h)
        elif isinstance(v, bool):
            h = xxh64_int(1 if v else 0, h)
        elif isinstance(v, int):
            h = xxh64_long(v, h)
        elif isinstance(v, bytes):
            h = xxh64_bytes(v, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        else:
            raise TypeError(
                f"unsupported type for xxhash64 parity: {type(v)} — pass types="
            )
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of_py(n_buckets: int, *values, seed: int = 42, types: list[str] | None = None) -> int:
    """Driver-side twin of ``plans.lake.bucket_of`` (pmod(xxhash64, n))."""
    return spark_xxhash64(*values, seed=seed, types=types) % n_buckets
