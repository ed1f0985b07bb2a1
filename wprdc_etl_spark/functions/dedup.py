"""Document-level deduplication for training-data pipelines.

Four tiers, all Spark-first:

- ``exact_dedup`` — hash-groupBy on sha256(text): one hash aggregate with
  map-side combine; the scale baseline.
- ``minhash_signatures`` + ``lsh_candidate_pairs`` — MinHash+LSH near-dup:
  shingle → minhash → band → bucket-join. Signatures are computed with
  *built-in expressions only*: shingles via ``sequence``+``transform``
  (no explode blow-up — the shingle array stays inside one row),
  per-permutation minima via ``array_min`` over ``transform``; bands then
  explode (b rows per doc, not |shingles| rows) and candidates come from a
  groupBy on (band, band_hash). Shuffle volume is O(docs × bands), never
  O(docs × shingles).
- ``simhash`` — 64-bit sign-aggregated token-hash fingerprint (built-ins:
  explode-free via transform over bit positions), with banded Hamming
  candidate generation.
- ``ngram_jaccard_pairs`` — exact word-n-gram Jaccard for candidate pairs
  (or within small blocking groups), the verifier behind the approximate
  tiers; SQL-expressible, so it carries a DuckDB oracle.

Permutation hashes are the classic (a_i·h + b_i) mod p family over
``xxhash64(shingle)``, with (a_i, b_i) drawn from a fixed-seed generator —
fully deterministic across runs and cluster sizes.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit Mersenne prime: (p-1)^2 < 2^63, so the affine map a·h + b never
# overflows a long under ANSI arithmetic; plenty of range for minhash.
_MERSENNE_P = (1 << 31) - 1


def _perm_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    rnd = random.Random(seed)
    return [(rnd.randrange(1, _MERSENNE_P), rnd.randrange(0, _MERSENNE_P)) for _ in range(n_hashes)]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct text; report copy counts."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "text_sha", "n_copies")
    )


def _shingle_array(text: Column, k: int) -> Column:
    """All k-character shingles of ``text`` as an array<long> of xxhash64
    values — built-ins only; the array lives inside the row (no explode)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.transform(idx, lambda i: F.xxhash64(F.substr(text, i, F.lit(k))))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """→ (id, signature: array<long>[n_hashes]).

    sig_i = min over shingles s of (a_i·xxhash64(s) + b_i) mod p — computed
    per row with ``array_min(transform(...))``; whole-stage codegen, zero
    shuffles, zero Python.
    """
    coeffs = _perm_coeffs(n_hashes, seed)
    sh = _shingle_array(F.col(text_col), shingle_k)
    tmp = df.select(F.col(id_col), sh.alias("_sh"))
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_sh"),
                    # reduce the signed xxhash64 into [0, p) first so the
                    # affine map stays within long range
                    lambda h: (F.lit(a) * F.pmod(h, F.lit(_MERSENNE_P)) + F.lit(b))
                    % F.lit(_MERSENNE_P),
                )
            )
            for a, b in coeffs
        ]
    )
    return tmp.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    *,
    n_bands: int = 16,
    est_threshold: float | None = None,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate pairs (a < b) with the
    signature-estimated Jaccard. With r rows per band the candidate curve is
    the classic (1 - (1 - j^r)^b).

    Scale shape: explode to n_bands rows per doc, groupBy (band, hash) — a
    single shuffle keyed by band hash; buckets are tiny unless docs really
    collide. Self-join happens within buckets only.
    """
    banded = sigs.select(
        F.col(id_col),
        F.col("signature"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(
                                F.col("signature"),
                                b * (F.size(F.col("signature")) / n_bands).cast("int") + 1,
                                (F.size(F.col("signature")) / n_bands).cast("int"),
                            ),
                            lambda x: x.cast("string"),
                        ),
                    ),
                    b,
                ),
            )
        ).alias("band", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.col("l.signature").alias("_sa"),
            F.col("r.signature").alias("_sb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("_sa", "_sb", lambda a, b: a == b), lambda x: x))
        / F.size("_sa")
    ).alias("est_jaccard")
    out = pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
    if est_threshold is not None:
        out = out.where(F.col("est_jaccard") >= est_threshold)
    return out


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit i of the fingerprint is the
    sign of Σ_tokens (±1 depending on bit i of xxhash64(token)). Built-ins
    only: the token array stays in-row; one transform per bit aggregates via
    ``aggregate`` — no explode, no shuffle, no Python."""
    def signed_bit(i: int) -> int:
        # bit 63 of a signed long is the sign bit: 1<<63 must be expressed
        # as Long.MIN_VALUE or the py4j literal overflows
        return (1 << i) if i < 63 else -(1 << 63)

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(signed_bit(i))) != 0, 1).otherwise(-1),
        )
        for i in range(64)
    ]
    fp = None
    for i, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(signed_bit(i)).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return df.select(F.col(id_col), fp.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact word-n-gram Jaccard for all pairs within a blocking group
    (or for LSH candidates when joined against them). Fully SQL-expressible
    → DuckDB oracle. Shape: explode distinct n-grams (|doc| rows), self-join
    on (block, ngram) → intersection counts; union via |A|+|B|−∩."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    ngrams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
    base = df.select(F.col(id_col), F.col(block_col).alias("_blk"), ngrams.alias("_ng"))
    sizes = base.select(F.col(id_col), F.col("_blk"), F.size("_ng").alias("_n"))
    exploded = base.select(F.col(id_col), F.col("_blk"), F.explode("_ng").alias("_g"))
    l, r = exploded.alias("l"), exploded.alias("r")
    inter = (
        l.join(
            r,
            on=[
                F.col("l._blk") == F.col("r._blk"),
                F.col("l._g") == F.col("r._g"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter")), 4
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out
