"""Z-order (Morton-curve) clustering key — multi-column data skipping.

``cluster_within_buckets`` sorts rows lexicographically inside each write
task, which gives tight parquet row-group min/max stats for the LEADING
column only (plans/lake.py notes the limitation where the knob is
declared): once the leading column has many values per row group, every
trailing column cycles its full range and its stats prune nothing. The
classical fix — Delta's ``OPTIMIZE ZORDER BY``, the same idea Iceberg
exposes via sort orders on truncated transforms — is to sort by a
space-filling curve so EVERY clustered column's value range is bounded
within any contiguous run of rows: selective scans on any of the columns
skip row groups, not just scans on the first.

Construction (all JVM-side, codegen'd — no UDF, no shuffle; the key is
only a sort expression inside the existing per-task sort):

1. each column is mapped to a ``bits_per_col``-bit integer code by
   min-max scaling between the column's observed bounds (``zorder_stats``
   — ONE aggregation scan, driver-side literals thereafter). Strings are
   coded by an order-preserving 7-byte prefix (codepoints clamped to 255,
   base-256 packed) before scaling; timestamps/dates scale on their
   numeric representation.
2. the per-column codes are bit-interleaved into one long (column j
   contributes bit i at position ``i * n_cols + (n_cols - 1 - j)``), the
   Morton code: sorting by it is walking the Z-curve.

Min-max scaling is a LAYOUT heuristic, not a correctness surface: skewed
distributions degrade skipping but never results (stats out-of-date values
clamp into range). Exact rank-based coding (quantile histograms) would
resist skew better at the cost of per-column quantile passes — the
min-max form is what a 10^10-row nightly OPTIMIZE can afford.

``zorder_key_py`` is the bit-exact pure-Python twin used by the tests to
pin the curve independent of Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 7-char prefix, codepoints clamped to one byte: order-preserving for the
# prefix, 56 bits — inside a signed long (8 chars would reach 2^64 and
# overflow under ANSI arithmetic)
_PREFIX_CHARS = 7

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType,
)


def _string_prefix_code(col: Column) -> Column:
    """Order-preserving long code of a string's first 7 characters."""
    code = F.lit(0).cast("long")
    for i in range(_PREFIX_CHARS):
        # coalesce BEFORE least: least() skips nulls, so a null/short
        # string would otherwise code as 255s instead of 0s
        ch = F.least(
            F.coalesce(F.ascii(F.substring(col, i + 1, 1)), F.lit(0)),
            F.lit(255),
        ).cast("long")
        code = code * 256 + ch
    return code


def _string_prefix_code_py(s: str | None) -> int:
    code = 0
    for i in range(_PREFIX_CHARS):
        c = min(ord(s[i]), 255) if s is not None and i < len(s) else 0
        code = code * 256 + c
    return code


def _numeric_expr(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StringType):
        return _string_prefix_code(col)
    if isinstance(dtype, (T.TimestampType, T.DateType)):
        return col.cast("long").cast("double")
    if isinstance(dtype, _NUMERIC + (T.DecimalType,)):
        return col.cast("double")
    raise ValueError(f"zorder does not support column type {dtype.simpleString()}")


def zorder_stats(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(lo, hi) bounds of each column's numeric code — ONE aggregation scan
    (map-side combined min/max, narrow result collected driver-side)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in schema]
    if missing:
        raise ValueError(f"zorder columns not in the data: {missing}")
    aggs = []
    for c in cols:
        e = _numeric_expr(F.col(c), schema[c]).cast("double")
        aggs += [F.min(e).alias(f"_lo_{c}"), F.max(e).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        lo, hi = row[f"_lo_{c}"], row[f"_hi_{c}"]
        out[c] = (float(lo if lo is not None else 0.0),
                  float(hi if hi is not None else 0.0))
    return out


def _scaled_code(e: Column, lo: float, hi: float, bits: int) -> Column:
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = F.floor((e.cast("double") - F.lit(lo)) * F.lit(top / (hi - lo)))
    return F.greatest(F.lit(0), F.least(F.lit(top), F.coalesce(scaled, F.lit(0)))).cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    stats: dict[str, tuple[float, float]],
    *,
    bits_per_col: int | None = None,
) -> Column:
    """The Morton code column over ``cols`` with the given bounds. Total
    width caps at ~30 bits (expression size stays codegen-friendly and the
    curve resolution already far exceeds row-group granularity)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder needs at least one column")
    bits = bits_per_col or max(1, 30 // n)
    if bits * n > 63:
        # bit position (bits-1)*n + (n-1) = bits*n - 1 must stay below the
        # long's sign bit: a signed Morton key would sort the upper half of
        # the range FIRST (and silently diverge from the unbounded-int
        # Python twin)
        raise ValueError(
            f"bits_per_col={bits} x {n} columns exceeds 63 bits"
        )
    schema = {f.name: f.dataType for f in df.schema.fields}
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        lo, hi = stats[c]
        code = _scaled_code(_numeric_expr(F.col(c), schema[c]), lo, hi, bits)
        for i in range(bits):
            bit = F.shiftright(code, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + (n - 1 - j)))
    return z


def zorder_key_py(
    values: list,
    dtypes: list[T.DataType],
    stats: list[tuple[float, float]],
    *,
    bits_per_col: int | None = None,
) -> int:
    """Bit-exact Python twin of ``zorder_key`` for one row."""
    n = len(values)
    bits = bits_per_col or max(1, 30 // n)
    if bits * n > 63:
        raise ValueError(f"bits_per_col={bits} x {n} columns exceeds 63 bits")
    top = (1 << bits) - 1
    z = 0
    for j, (v, dt, (lo, hi)) in enumerate(zip(values, dtypes, stats)):
        if isinstance(dt, T.StringType):
            e = float(_string_prefix_code_py(v))
        elif v is None:
            e = None
        else:
            e = float(v)
        if hi <= lo:
            code = 0
        elif e is None:
            code = 0
        else:
            import math

            code = max(0, min(top, math.floor((e - lo) * (top / (hi - lo)))))
        for i in range(bits):
            z |= ((code >> i) & 1) << (i * n + (n - 1 - j))
    return z
