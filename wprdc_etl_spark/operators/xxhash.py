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


def spark_xxhash64(*values, seed: int = 42) -> int:
    """The value of Spark's ``F.xxhash64(*cols)`` for one row: each column
    hashes with the running hash as seed; nulls are skipped (Spark keeps the
    previous hash for null inputs). Returns a SIGNED 64-bit int like Spark."""
    h = seed
    for v in values:
        if v is None:
            continue
        if isinstance(v, bool):
            h = xxh64_int(1 if v else 0, h)
        elif isinstance(v, int):
            h = xxh64_long(v, h)
        elif isinstance(v, bytes):
            h = xxh64_bytes(v, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        else:
            raise TypeError(f"unsupported type for xxhash64 parity: {type(v)}")
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of_py(n_buckets: int, *values, seed: int = 42) -> int:
    """Driver-side twin of ``plans.lake.bucket_of`` (pmod(xxhash64, n))."""
    return spark_xxhash64(*values, seed=seed) % n_buckets
