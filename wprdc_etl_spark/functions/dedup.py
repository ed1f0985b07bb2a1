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


def _leaf_hash(col: Column, hash_fn: str) -> Column:
    """64/60-bit hash of a string column.

    - ``xxhash64`` (default): fastest JVM hash — the 100-TB production path.
    - ``sha2``: first 15 hex chars (60 bits) of sha256 — bit-identical in
      DuckDB (``CAST('0x'||substr(sha256(s),1,15) AS BIGINT)``), so pipelines
      built on it carry exact SQL oracles. Same operator, slower leaf.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(col)
    if hash_fn == "sha2":
        return F.conv(F.substring(F.sha2(col, 256), 1, 15), 16, 10).cast("long")
    raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'xxhash64' or 'sha2')")


def leaf_hash_sql(expr: str) -> str:
    """DuckDB twin of ``_leaf_hash(col, 'sha2')``."""
    return f"CAST(('0x' || substr(sha256({expr}), 1, 15)) AS BIGINT)"


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per distinct text; report copy counts."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "text_sha", "n_copies")
    )


def _shingle_array(text: Column, k: int, hash_fn: str = "xxhash64") -> Column:
    """All k-character shingles of ``text`` as an array<long> of leaf-hash
    values — built-ins only; the array lives inside the row (no explode)."""
    n = F.greatest(F.length(text) - F.lit(k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.transform(idx, lambda i: _leaf_hash(F.substr(text, i, F.lit(k)), hash_fn))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_hashes: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """→ (id, signature: array<long>[n_hashes]).

    sig_i = min over shingles s of (a_i·hash(s) + b_i) mod p — computed
    per row with ``array_min(transform(...))``; whole-stage codegen, zero
    shuffles, zero Python. ``hash_fn='sha2'`` swaps the leaf hash for the
    oracle-computable sha256 prefix (see ``_leaf_hash``) so the whole
    signature has an exact DuckDB twin (``minhash_signature_sql``).

    The per-row work is O(n_hashes × shingles) — CPU-heavy map work that
    parallelizes with INPUT partitions (no shuffle to rebalance it). A
    real corpus has >> cores input splits; a small single-file input
    should be ``.repartition(cores)``'d by the caller first (measured
    4–5× on this box; bench.py does this).
    """
    coeffs = _perm_coeffs(n_hashes, seed)
    sh = _shingle_array(F.col(text_col), shingle_k, hash_fn)
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


def band_rows(
    sigs: DataFrame, id_col: str = "doc_id", *, n_bands: int = 16,
    keep_signature: bool = True,
) -> DataFrame:
    """Explode signatures to their LSH band rows — ``(id, band:int,
    band_hash:long[, signature])``, n_bands rows per doc. The shared
    banding leaf of ``lsh_candidate_pairs`` (batch self-join) and
    ``NearDupIndex`` (persisted incremental index): both must hash bands
    identically or incremental candidates would diverge from batch ones."""
    out = sigs.select(
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
    return out if keep_signature else out.drop("signature")


def sig_est_jaccard(sa: Column, sb: Column) -> Column:
    """Signature-estimated Jaccard: matching positions / n_hashes, rounded
    the way every pair emitter here rounds (stable across batch/incremental)."""
    return F.round(
        F.size(F.filter(F.zip_with(sa, sb, lambda a, b: a == b), lambda x: x))
        / F.size(sa),
        4,
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    *,
    n_bands: int = 16,
    est_threshold: float | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signatures, bucket-join, emit candidate pairs (a < b) with the
    signature-estimated Jaccard. With r rows per band the candidate curve is
    the classic (1 - (1 - j^r)^b).

    Scale shape: explode to n_bands rows per doc, groupBy (band, hash) — a
    single shuffle keyed by band hash; buckets are tiny unless docs really
    collide. Self-join happens within buckets only.

    ``max_bucket`` guards the skewed-shingle blowup: a band bucket holding m
    docs emits m·(m-1)/2 pairs, so one boilerplate cluster shared by 10⁵
    docs would alone emit ~5·10⁹ candidates. Buckets larger than the cap are
    excluded from the pair join (one extra narrow count-agg + broadcast
    anti-join on the ≤handful of hot (band, band_hash) keys). Excluded
    buckets are boilerplate-dominated groups, not near-dup pairs — members
    share ONE common block (pairwise Jaccard far below any dedup threshold),
    and genuinely near-dup pairs inside such a group still collide in their
    OTHER, non-boilerplate bands. Measured at 10⁶ docs with a planted 30%
    boilerplate cluster: see BENCH/BASELINE.md round-4 corpus anchors.
    """
    banded = band_rows(sigs, id_col, n_bands=n_bands)
    if max_bucket is not None:
        hot = (
            banded.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_m"))
            .where(F.col("_m") > int(max_bucket))
            .select("band", "band_hash")
        )
        banded = banded.join(
            F.broadcast(hot), ["band", "band_hash"], "left_anti"
        )
    left = banded.alias("l")
    right = banded.alias("r")
    # est_jaccard is computed IN the join projection and the threshold filter
    # applied BEFORE dropDuplicates, so the dedup exchange shuffles a narrow
    # (id_a, id_b, est) row (~20 B) instead of both 32-long signatures
    # (~600 B/row) — a pair colliding in k bands is emitted k times by the
    # join, and at 10⁶ docs that pre-dedup stream is the dominant shuffle.
    # Output-identical: est is a pure function of the pair, so every
    # duplicate emission carries the same value and filter∘dedup ≡
    # dedup∘filter. (Measured at 300k docs in the index-probe twin of this
    # join: 453 s → 32 s. BENCH/BASELINE.md round-4 corpus anchors.)
    out = (
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
            sig_est_jaccard(F.col("l.signature"), F.col("r.signature")).alias(
                "est_jaccard"
            ),
        )
    )
    if est_threshold is not None:
        out = out.where(F.col("est_jaccard") >= est_threshold)
    return out.dropDuplicates(["id_a", "id_b"])


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    hash_fn: str = "xxhash64",
    n_bits: int = 64,
) -> DataFrame:
    """n_bits SimHash over whitespace tokens: bit i of the fingerprint is the
    sign of Σ_tokens (±1 depending on bit i of hash(token)). Built-ins
    only: the token array stays in-row; one transform per bit aggregates via
    ``aggregate`` — no explode, no shuffle, no Python.

    ``hash_fn='sha2', n_bits=60`` yields the oracle-parity variant whose
    DuckDB twin is ``simhash_sql`` (the sha2 leaf hash carries 60 bits)."""
    def signed_bit(i: int) -> int:
        # bit 63 of a signed long is the sign bit: 1<<63 must be expressed
        # as Long.MIN_VALUE or the py4j literal overflows
        return (1 << i) if i < 63 else -(1 << 63)

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    hashes = F.transform(toks, lambda t: _leaf_hash(t, hash_fn))
    bit_sums = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(signed_bit(i))) != 0, 1).otherwise(-1),
        )
        for i in range(n_bits)
    ]
    fp = None
    for i, s in enumerate(bit_sums):
        bit = F.when(s > 0, F.lit(signed_bit(i)).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return df.select(F.col(id_col), fp.alias("simhash"))


def simhash_sql(
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    *,
    n_bits: int = 60,
) -> str:
    """DuckDB twin of ``simhash(df, hash_fn='sha2', n_bits=n_bits)``."""
    hs = (
        f"list_transform(string_split_regex(trim({text_expr}), '\\s+'), "
        f"t -> {leaf_hash_sql('t')})"
    )
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, "
        f"h -> CASE WHEN (h >> {i}) & 1 <> 0 THEN 1 ELSE -1 END)) > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(n_bits)
    )
    return (
        f"SELECT {id_expr} AS doc_id, ({bits}) AS simhash "
        f"FROM (SELECT {id_expr}, {hs} AS hs FROM {table}) t"
    )


def lsh_pairs_sql(
    table: str = "documents",
    text_expr: str = "text",
    id_expr: str = "doc_id",
    *,
    n_hashes: int = 32,
    shingle_k: int = 5,
    n_bands: int = 8,
    seed: int = 42,
    est_threshold: float = 0.3,
) -> str:
    """DuckDB twin of minhash_signatures(hash_fn='sha2') → lsh_candidate_pairs.

    Same permutation coefficients (same seeded generator), same sha2 leaf
    hash, bands compared by value (Spark buckets on xxhash64 of the same band
    string — identical pairs modulo 2^-64 hash collisions)."""
    coeffs = _perm_coeffs(n_hashes, seed)
    r = n_hashes // n_bands
    leaf = leaf_hash_sql(f"substr({text_expr}, CAST(i AS INT), {shingle_k})")
    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * (h % {_MERSENNE_P}) + {b}) % {_MERSENNE_P}))"
        for a, b in coeffs
    )
    return f"""
WITH sh AS (
  SELECT {id_expr} AS doc_id,
         list_transform(generate_series(1, greatest(length({text_expr}) - {shingle_k - 1}, 1)),
                        i -> {leaf}) AS hs
  FROM {table}
), sig AS (
  SELECT doc_id, [{sig_items}] AS signature FROM sh
), bands AS (
  SELECT doc_id, b,
         array_to_string(signature[b*{r}+1 : b*{r}+{r}], ',') AS bkey
  FROM sig, UNNEST(generate_series(0, {n_bands - 1})) AS u(b)
), pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r ON l.b = r.b AND l.bkey = r.bkey AND l.doc_id < r.doc_id
)
SELECT id_a, id_b,
       round(len(list_filter(list_zip(sa.signature, sb.signature), x -> x[1] = x[2]))
             / len(sa.signature), 4) AS est_jaccard
FROM pairs JOIN sig sa ON sa.doc_id = id_a JOIN sig sb ON sb.doc_id = id_b
WHERE round(len(list_filter(list_zip(sa.signature, sb.signature), x -> x[1] = x[2]))
            / len(sa.signature), 4) >= {est_threshold}
"""


def _word_ngrams(text_col: str, n: int) -> Column:
    """Distinct word n-grams (the ngram_jaccard_pairs convention: docs with
    fewer than n words contribute their whole text as one 'gram')."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    hash_fn: str = "xxhash64",
    out_col: str = "contaminated",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing ANY word n-gram
    with an evaluation set (the industry-standard 13-gram collision rule;
    pass a smaller ``n`` for short-document corpora).

    Scale shape for a 100-TB corpus vs a few-MB benchmark: the benchmark's
    DISTINCT n-gram hash set is tiny and BROADCASTS; corpus n-grams are
    generated in-row (transform over the token array — no shuffle) and meet
    the set in a broadcast semi join, so no corpus byte ever shuffles — the
    only aggregation is the distinct over flagged doc ids, O(|hits|). The
    n-gram leaf hash is pluggable (xxhash64 production / sha2 for the exact
    DuckDB twin, the functions/dedup.py convention); exact-copy
    decontamination is the degenerate case via ``exact_dedup``'s sha key.
    """
    bng = (
        benchmark.select(F.explode(_word_ngrams(text_col, n)).alias("_s"))
        .select(_leaf_hash(F.col("_s"), hash_fn).alias("_g"))
        .distinct()
    )
    cng = corpus.select(F.col(id_col), F.explode(_word_ngrams(text_col, n)).alias("_s"))
    cng = cng.select(id_col, _leaf_hash(F.col("_s"), hash_fn).alias("_g"))
    hits = cng.join(F.broadcast(bng), "_g", "left_semi").select(id_col).distinct()
    return corpus.join(
        hits.withColumn(out_col, F.lit(True)), [id_col], "left"
    ).withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))


def contamination_sql(
    corpus: str,
    benchmark: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> str:
    """DuckDB twin of contamination_flags(hash_fn='sha2'): same tokenizer
    (regex whitespace split of trimmed text), same short-doc convention,
    same sha2 leaf on the joined gram strings."""
    leaf = leaf_hash_sql(f"array_to_string(w[CAST(i AS INT):CAST(i AS INT)+{n - 1}], ' ')")
    grams = (
        f"SELECT {{id_sel}} {leaf} AS g FROM ("
        f"SELECT {{id_col_inner}} w, unnest(generate_series(1, greatest(len(w) - {n - 1}, 1))) AS i "
        f"FROM (SELECT {{id_col_inner}} string_split_regex(trim({text_col}), '\\s+') AS w "
        f"FROM {{rel}}))"
    )
    bng = grams.format(id_sel="DISTINCT", id_col_inner="", rel=benchmark)
    cng = grams.format(id_sel=f"DISTINCT {id_col},", id_col_inner=f"{id_col},", rel=corpus)
    return f"""
SELECT c.{id_col}, (h.{id_col} IS NOT NULL) AS contaminated
FROM {corpus} c
LEFT JOIN (SELECT DISTINCT cg.{id_col}
           FROM ({cng}) cg JOIN ({bng}) bg USING (g)) h
  USING ({id_col})
""".strip()


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
    n: int = 3,
    threshold: float = 0.1,
    max_doc_freq: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact word-n-gram Jaccard for all pairs within a blocking group
    (or for LSH candidates when joined against them). Fully SQL-expressible
    → DuckDB oracle. Shape: explode distinct n-grams (|doc| rows), self-join
    on (block, ngram) → intersection counts; union via |A|+|B|−∩.

    Scale guards — the block self-join is quadratic in a block's posting
    lists, so a single ngram shared by every doc in one block explodes:

    - ``max_doc_freq``: drop ngrams whose within-block document frequency
      exceeds the cap BEFORE the self-join. A d-frequent ngram contributes
      d·(d−1)/2 join rows while carrying ~zero Jaccard signal — the classic
      stop-ngram cutoff. NOTE: pairs whose intersection was entirely
      stop-ngrams are missed (exactness trades for the bound); denominators
      stay exact because sizes are computed before the cutoff.
    - ``candidates``: an (id_a, id_b) DataFrame (e.g. lsh_candidate_pairs
      output) — restrict the quadratic verifier to candidate pairs via a
      semi-join on both sides of the intersection.
    """
    base = df.select(
        F.col(id_col), F.col(block_col).alias("_blk"), _word_ngrams(text_col, n).alias("_ng")
    )
    sizes = base.select(F.col(id_col), F.col("_blk"), F.size("_ng").alias("_n"))
    exploded = base.select(F.col(id_col), F.col("_blk"), F.explode("_ng").alias("_g"))
    if max_doc_freq is not None:
        freq_ok = (
            exploded.groupBy("_blk", "_g")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select("_blk", "_g")
        )
        exploded = exploded.join(freq_ok, ["_blk", "_g"], "left_semi")
    if candidates is not None:
        # verifier mode: only candidate pairs ever enter the join — the left
        # posting list fans out to its (few) candidate partners first, then
        # matches the partner's ngrams; work is O(Σ_pairs |doc|), not O(d²)
        # NO block-equality predicate here: the candidate set already bounds
        # the join, and LSH candidates are generated block-agnostically —
        # requiring _blk == _blkb would silently drop cross-block candidate
        # pairs (ADVICE r2). Blocking is a non-candidates-mode concern only.
        lc = exploded.withColumnRenamed(id_col, "id_a").join(
            F.broadcast(candidates.select("id_a", "id_b")), "id_a"
        )
        rgt = exploded.select(
            F.col(id_col).alias("_idb"), F.col("_g").alias("_gb")
        )
        inter = (
            lc.join(
                rgt,
                on=(F.col("id_b") == F.col("_idb")) & (F.col("_g") == F.col("_gb")),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("_inter"))
        )
    else:
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


def cross_corpus_pairs(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n_hashes: int = 32,
    shingle_k: int = 5,
    n_bands: int = 8,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    est_threshold: float | None = None,
) -> DataFrame:
    """Near-dup pairs ACROSS two corpora — dedupe a new crawl against the
    corpus you already trained on (or an eval set, fuzzily — the MinHash
    complement to ``contamination_flags``'s exact n-gram rule). Returns
    (id_a = corpus doc, id_b = reference doc, est_jaccard); a corpus doc
    appearing in any pair is a cross-corpus near-dup.

    Scale shape: both sides band to n_bands rows/doc (in-row signatures, no
    shuffle); the join is keyed on (band, band_hash) — the reference side is
    typically the smaller curated set, and AQE broadcasts it when it fits,
    so the crawl side never shuffles at all in the common case. Never
    all-pairs. Same banding leaf as lsh_candidate_pairs / NearDupIndex, so
    candidates agree with the within-corpus and incremental tiers.
    """
    sc = minhash_signatures(
        corpus, text_col, id_col, n_hashes=n_hashes, shingle_k=shingle_k,
        seed=seed, hash_fn=hash_fn,
    )
    sr = minhash_signatures(
        reference, text_col, id_col, n_hashes=n_hashes, shingle_k=shingle_k,
        seed=seed, hash_fn=hash_fn,
    )
    bc = band_rows(sc, id_col, n_bands=n_bands).alias("l")
    br = band_rows(sr, id_col, n_bands=n_bands).alias("r")
    pairs = (
        bc.join(
            br,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
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
    out = pairs.select(
        "id_a", "id_b", sig_est_jaccard(F.col("_sa"), F.col("_sb")).alias("est_jaccard")
    )
    if est_threshold is not None:
        out = out.where(F.col("est_jaccard") >= est_threshold)
    return out


def cross_lsh_sql(
    corpus_rel: str,
    reference_rel: str,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    *,
    n_hashes: int = 32,
    shingle_k: int = 5,
    n_bands: int = 8,
    seed: int = 42,
    est_threshold: float = 0.3,
) -> str:
    """DuckDB twin of cross_corpus_pairs(hash_fn='sha2') — the two-relation
    form of lsh_pairs_sql (bands compared by value; Spark buckets on
    xxhash64 of the same band string)."""
    coeffs = _perm_coeffs(n_hashes, seed)
    r = n_hashes // n_bands
    leaf = leaf_hash_sql(f"substr({text_expr}, CAST(i AS INT), {shingle_k})")
    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> ({a} * (h % {_MERSENNE_P}) + {b}) % {_MERSENNE_P}))"
        for a, b in coeffs
    )

    def side(rel: str, name: str) -> str:
        return f"""
{name}_sh AS (
  SELECT {id_expr} AS doc_id,
         list_transform(generate_series(1, greatest(length({text_expr}) - {shingle_k - 1}, 1)),
                        i -> {leaf}) AS hs
  FROM {rel}
), {name}_sig AS (
  SELECT doc_id, [{sig_items}] AS signature FROM {name}_sh
), {name}_bands AS (
  SELECT doc_id, b,
         array_to_string(signature[b*{r}+1 : b*{r}+{r}], ',') AS bkey
  FROM {name}_sig, UNNEST(generate_series(0, {n_bands - 1})) AS u(b)
)"""

    return f"""
WITH {side(corpus_rel, 'c').lstrip()}, {side(reference_rel, 'f').lstrip()},
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM c_bands l JOIN f_bands r ON l.b = r.b AND l.bkey = r.bkey
)
SELECT id_a, id_b,
       round(len(list_filter(list_zip(sa.signature, sb.signature), x -> x[1] = x[2]))
             / len(sa.signature), 4) AS est_jaccard
FROM pairs JOIN c_sig sa ON sa.doc_id = id_a JOIN f_sig sb ON sb.doc_id = id_b
WHERE round(len(list_filter(list_zip(sa.signature, sb.signature), x -> x[1] = x[2]))
            / len(sa.signature), 4) >= {est_threshold}
"""
