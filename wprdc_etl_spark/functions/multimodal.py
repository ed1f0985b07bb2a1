"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` with Arrow-batched binary columns, deterministic batch
shapes. The *codec* step (actual JPEG/audio decode) is stubbed behind a
clearly-marked ``NotImplementedError`` because the image/audio libraries are
not in this container; ``fake_decode_features`` is the deterministic stand-in
that exercises the identical dataflow (bytes in → feature struct out).

Synthetic media blobs have a parseable 16-byte header
(magic 'WPRD' | kind u8 | width u16 | height u16 | ... ) so the fake decoder
has something honest to parse.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image | audio | video
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_sha", T.StringType()),
    ]
)

_MAGIC = b"WPRD"
_KINDS = ["image", "audio", "video"]


def gen_media(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table: header + pseudo-random payload
    derived from (seed, i). Driver-free: generated distributed via
    mapInPandas over spark.range."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(i))
                kind = _KINDS[int(i) % 3]
                w, h = int(rng.integers(8, 512)), int(rng.integers(8, 512))
                body = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8)
                header = _MAGIC + struct.pack("<BHH", _KINDS.index(kind), w, h) + b"\x00" * 7
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": header + body.tobytes(),
                        "meta": {"codec": "synthetic", "v": "1"},
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(df: DataFrame, *, codec: str = "fake") -> DataFrame:
    """Decode/feature-extract over Arrow batches (mapInPandas — partition-
    preserving, no shuffle). ``codec='real'`` is the production hook and
    raises until a decoder library (PIL/libav) exists in the image."""
    if codec == "real":
        raise NotImplementedError(
            "real image/audio decode requires PIL/libav, not present in this "
            "container — the Spark plumbing below is identical; plug the "
            "decoder into _extract()."
        )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = []
            # column-zip, not iterrows: no per-row pandas Series construction
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != _MAGIC or len(b) < 16:
                    kind_s, w, h = "corrupt", 0, 0
                    body = b
                else:
                    kind_i, w, h = struct.unpack("<BHH", b[4:9])
                    kind_s = _KINDS[kind_i] if kind_i < len(_KINDS) else "unknown"
                    body = b[16:]
                arr = np.frombuffer(body, dtype=np.uint8)
                out.append(
                    {
                        "media_id": mid,
                        "kind": kind_s,
                        "width": int(w),
                        "height": int(h),
                        "n_bytes": len(b),
                        "mean_byte": float(arr.mean()) if arr.size else 0.0,
                        # sha256 of the UPPERCASE hex encoding (not the raw
                        # bytes): same fingerprint strength, and DuckDB 1.0's
                        # sha256 only accepts VARCHAR — this keeps the
                        # feature oracle-computable (media_features_sql)
                        "byte_sha": hashlib.sha256(b.hex().upper().encode()).hexdigest(),
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def media_features_sql(media_rel: str) -> str:
    """DuckDB twin of decode_media(codec='fake') over a persisted media table
    (``media_rel`` is a table/relation expression, e.g. read_parquet(...)).
    Parses the same 16-byte header out of the BLOB via hex() arithmetic."""
    hx = "hex(payload)"
    ok = f"(substr({hx}, 1, 8) = '57505244' AND octet_length(payload) >= 16)"
    byte_at = "CAST('0x' || substr(" + hx + ", 2*{i}-1, 2) AS INT)"
    kind_i = byte_at.format(i=5)
    width = f"CAST('0x' || substr({hx}, 13, 2) || substr({hx}, 11, 2) AS INT)"
    height = f"CAST('0x' || substr({hx}, 17, 2) || substr({hx}, 15, 2) AS INT)"
    kind_case = (
        f"CASE WHEN NOT {ok} THEN 'corrupt' "
        f"WHEN {kind_i} = 0 THEN 'image' WHEN {kind_i} = 1 THEN 'audio' "
        f"WHEN {kind_i} = 2 THEN 'video' ELSE 'unknown' END"
    )
    body_start = f"CASE WHEN {ok} THEN 17 ELSE 1 END"
    body_bytes = (
        f"list_transform(generate_series({body_start}, octet_length(payload)), "
        f"i -> CAST('0x' || substr({hx}, 2*i-1, 2) AS INT))"
    )
    mean_byte = (
        f"CASE WHEN octet_length(payload) >= {body_start} "
        f"THEN CAST(list_avg({body_bytes}) AS DOUBLE) ELSE 0.0 END"
    )
    return f"""
SELECT media_id, {kind_case} AS kind,
       CASE WHEN {ok} THEN {width} ELSE 0 END AS width,
       CASE WHEN {ok} THEN {height} ELSE 0 END AS height,
       octet_length(payload) AS n_bytes,
       {mean_byte} AS mean_byte,
       sha256({hx}) AS byte_sha
FROM {media_rel}
"""


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan* — the partitioning/selection side of frame
    extraction (the decode itself goes through decode_media). Selects every
    n-th media row per kind deterministically; at scale this is a pushed-down
    filter, not a shuffle."""
    return df.where(
        (F.col("kind") == "video") & (F.pmod(F.col("media_id"), F.lit(every_n)) == 0)
    )
