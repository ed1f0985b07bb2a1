"""Token-aware training-shard packing.

The last mile of a pretraining-data pipeline: after dedup/quality filtering,
documents must be assigned to N output shards with BALANCED token totals —
naive round-robin by doc count leaves shards skewed by document length, and a
skewed shard is a straggler for every downstream consumer (tokenizer runs,
packing into context windows, epoch sharding).

Scale shape (the 100-TB contract): no global sort. Documents hash into
``n_groups`` independent groups (a pure narrow projection); each group sorts
ONLY its own rows by token count inside a keyed window (one shuffle,
``n_groups``-way parallel) and deals them round-robin across all shards,
offset by the group id so the groups' largest documents land on DIFFERENT
shards. Sorted round-robin is the classic LPT load-balancing approximation;
with G groups each shard receives the G local streams' k-th largest docs
interleaved, so totals concentrate tightly around corpus_tokens/n_shards
(test_packing asserts the spread). Every step is deterministic and has an
exact ANSI-SQL twin (``pack_shards_sql``) for the DuckDB oracle: the 'sha2'
leaf hash is bit-identical on both engines, while 'xxhash64' is the cheaper
production leaf (same operator, same plan).

Parity note: the reference (WPRDC/wprdc-etl) has no distribution concept —
its loader writes one CKAN datastore sequentially. This operator exists for
the engine's training-data mission (grand brief: training-pipeline ops are
first-class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from wprdc_etl_spark.functions.dedup import _leaf_hash, leaf_hash_sql
from wprdc_etl_spark.functions.text import token_count
from pyspark.sql import Window


def pack_shards(
    df: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_groups: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign every document a ``shard_id`` in [0, n_shards) with balanced
    per-shard token totals. Returns (id_col, n_tokens, shard_id).

    ``tokens_col`` may name a precomputed token-count column; otherwise
    whitespace ``token_count(text_col)`` is used. ``n_groups`` bounds the
    window-shuffle granularity: each group is an independent sort of
    ~rows/n_groups documents — raise it if groups outgrow executor memory
    (any value preserves determinism and balance; it never needs to match
    n_shards).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be >= 1, got {n_groups}")
    tokens = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col),
        tokens.alias("n_tokens"),
        F.pmod(
            _leaf_hash(F.col(id_col).cast("string"), hash_fn), F.lit(n_groups)
        ).alias("_grp"),
    )
    rn = F.row_number().over(
        Window.partitionBy("_grp").orderBy(
            F.col("n_tokens").desc(), F.col(id_col).asc()
        )
    )
    return base.select(
        id_col,
        "n_tokens",
        F.pmod(rn - F.lit(1) + F.col("_grp"), F.lit(n_shards))
        .cast("long")
        .alias("shard_id"),
    )


def shard_stats(packed: DataFrame) -> DataFrame:
    """Per-shard doc/token totals (one hash agg, map-side combine)."""
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens")
    )


def pack_shards_sql(
    table: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    tokens_sql: str,
    n_groups: int = 64,
) -> str:
    """DuckDB twin of ``pack_shards(..., hash_fn='sha2')``. ``tokens_sql``
    is the token-count expression over the text column (the leaf hash is
    non-negative, so plain ``%`` matches Spark's pmod)."""
    return f"""
WITH toks AS (
  SELECT {id_col}, CAST({tokens_sql} AS BIGINT) AS n_tokens,
         {leaf_hash_sql(f"CAST({id_col} AS VARCHAR)")} % {n_groups} AS grp
  FROM {table}
), ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY grp ORDER BY n_tokens DESC, {id_col} ASC) AS rn
  FROM toks
)
SELECT {id_col}, n_tokens,
       CAST((rn - 1 + grp) % {n_shards} AS BIGINT) AS shard_id
FROM ranked
"""
