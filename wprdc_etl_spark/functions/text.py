"""Text analysis for large-scale training-data pipelines.

Each function is a Column expression built from JVM-side built-ins (codegen'd,
no Python in the hot path) with an exact ANSI-SQL twin for the DuckDB oracle —
except ``rolling_fingerprint``, which demonstrates the vectorized
Arrow/pandas-UDF escape hatch for logic SQL can't express.

These generalize the reference's only row transforms — marshmallow string
coercions (SURVEY A16) — to the document-quality operations a 100 TB corpus
pipeline needs: token counting, quality scoring, language ID, fingerprinting.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

# Deterministic marker-word profiles for the n-gram/stopword language
# heuristic. Real corpora would use character trigram profiles; the mechanism
# (per-language match counts → argmax with a fixed tiebreak) is the same.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|a|of|and|to|is|in)\b",
    "de": r"\b(der|die|das|und|ist|nicht)\b",
    "es": r"\b(el|la|los|que|es|una)\b",
    "fr": r"\b(le|la|les|est|une|dans)\b",
    "zh": r"[一-鿿]",
}

_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_STOPWORDS = r"\b(the|a|of|and|to|is|in|that|it|for)\b"


def token_count(col: Column) -> Column:
    """Whitespace tokenization count."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish segmentation: alpha runs, digit runs, single punctuation."""
    return F.regexp_count(col, F.lit(_BPE_ISH)).cast("long")


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: alpha density, length band,
    stopword presence, punctuation penalty. Rounded to 4 dp so the Spark and
    DuckDB computations compare exactly."""
    n_chars = F.length(col)
    alpha = F.regexp_count(col, F.lit(r"[A-Za-z]")).cast("double")
    punct = F.regexp_count(col, F.lit(r"[^\w\s]")).cast("double")
    toks = token_count(col).cast("double")
    stop = F.regexp_count(col, F.lit(_STOPWORDS)).cast("double")
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    len_band = F.least(F.lit(1.0), toks / F.lit(100.0))
    stop_ratio = F.when(toks > 0, F.least(F.lit(1.0), stop / toks * 5)).otherwise(F.lit(0.0))
    punct_pen = F.when(n_chars > 0, F.least(F.lit(1.0), punct / n_chars * 10)).otherwise(F.lit(0.0))
    score = 0.4 * alpha_ratio + 0.3 * len_band + 0.3 * stop_ratio - 0.2 * punct_pen
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(1.0), score)), 4)


def quality_score_sql(text_expr: str = "text") -> str:
    """The DuckDB twin of quality_score (same arithmetic, same rounding)."""
    t = text_expr
    n = f"length({t})"
    alpha = f"CAST(length(regexp_replace({t}, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
    punct = f"CAST(len(regexp_extract_all({t}, '[^\\w\\s]')) AS DOUBLE)"
    toks = f"CAST(CASE WHEN length(trim({t})) = 0 THEN 0 ELSE len(string_split_regex(trim({t}), '\\s+')) END AS DOUBLE)"
    stop = f"CAST(len(regexp_extract_all({t}, '{_STOPWORDS}')) AS DOUBLE)"
    alpha_ratio = f"CASE WHEN {n} > 0 THEN {alpha} / {n} ELSE 0.0 END"
    len_band = f"least(1.0, {toks} / 100.0)"
    stop_ratio = f"CASE WHEN {toks} > 0 THEN least(1.0, {stop} / {toks} * 5) ELSE 0.0 END"
    punct_pen = f"CASE WHEN {n} > 0 THEN least(1.0, {punct} / {n} * 10) ELSE 0.0 END"
    score = f"0.4 * ({alpha_ratio}) + 0.3 * ({len_band}) + 0.3 * ({stop_ratio}) - 0.2 * ({punct_pen})"
    return f"round(greatest(0.0, least(1.0, {score})), 4)"


def lang_id(col: Column) -> Column:
    """N-gram/marker-word language heuristic: per-language marker counts →
    argmax, ties broken by the fixed profile order. 'und' when nothing
    matches."""
    counts = {lang: F.regexp_count(col, F.lit(pat)) for lang, pat in LANG_MARKERS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier profiles win ties
        expr = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(text_expr: str = "text") -> str:
    """DuckDB twin of lang_id."""
    cnt = {
        lang: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for lang, pat in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(cnt.values()) + ")"
    cases = " ".join(
        f"WHEN {cnt[lang]} > 0 AND {cnt[lang]} = {best} THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return f"CASE {cases} ELSE 'und' END"


def chunk_documents(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    overlap: int = 0,
    keep_cols: list[str] | None = None,
):
    """Split documents into fixed-width character windows with overlap — the
    context-window packing precursor (embedding indexing, long-doc training).

    Chunk i covers ``[i*step, i*step+size)`` with ``step = size - overlap``;
    the last chunk may be shorter; a doc with ``len <= size`` yields exactly
    one chunk; NULL text yields no chunks. Pure built-ins: the chunk list is
    one in-row ``transform(sequence(...))`` and a single ``posexplode`` —
    no shuffle, no Python; output size is len/step rows per doc, streamed
    out of the scan. (Token-aware chunking = run this on a pre-tokenized
    string; the window arithmetic is identical.)
    """
    if overlap < 0 or overlap >= size:
        raise ValueError(f"need 0 <= overlap < size, got size={size} overlap={overlap}")
    step = size - overlap
    n = F.when(F.length(text_col) <= size, F.lit(1)).otherwise(
        F.ceil((F.length(text_col) - F.lit(size)) / F.lit(float(step))) + 1
    )
    chunks = F.expr(
        f"transform(sequence(0L, __n_chunks - 1L), "
        f"i -> substring({text_col}, CAST(i AS INT) * {step} + 1, {size}))"
    )
    base = df.where(F.col(text_col).isNotNull()).withColumn("__n_chunks", n)
    keep = keep_cols or []
    out = base.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.posexplode(chunks).alias("chunk_id", "chunk"),
    )
    return out


def chunk_sql(
    relation: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    overlap: int = 0,
) -> str:
    """DuckDB twin of chunk_documents (generate_series is inclusive, hence
    ``n-1``; substring is 1-based in both dialects; the list-valued
    generate_series + SELECT-level unnest form — the table-function form
    rejects lateral column arguments)."""
    step = size - overlap
    n = (
        f"CASE WHEN length({text_col}) <= {size} THEN 1 "
        f"ELSE CAST(ceil((length({text_col}) - {size}) / CAST({step} AS DOUBLE)) AS BIGINT) + 1 END"
    )
    return (
        f"SELECT {id_col}, chunk_id, "
        f"substring({text_col}, CAST(chunk_id AS INT) * {step} + 1, {size}) AS chunk "
        f"FROM (SELECT {id_col}, {text_col}, "
        f"unnest(generate_series(0, ({n}) - 1)) AS chunk_id "
        f"FROM {relation} WHERE {text_col} IS NOT NULL)"
    )


# PII scrubbing: ordered (pattern → replacement) rules. RE2/Java-common
# syntax only (no lookaround), so the Spark and DuckDB engines replace the
# exact same spans. Email first (it contains digit runs), then IPv4, then
# long digit runs (phone/account numbers).
PII_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{10,}\b", "<NUM>"),
]


def redact_pii(col: Column) -> Column:
    """Replace emails / IPv4s / long digit runs with typed placeholders —
    a chain of JVM regexp_replace calls (codegen'd, no Python)."""
    out = col
    for pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii_sql(text_expr: str = "text") -> str:
    """DuckDB twin of redact_pii (global flag; same rule order; DuckDB
    string literals keep backslashes verbatim — no re-escaping)."""
    out = text_expr
    for pat, repl in PII_RULES:
        sql_pat = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{sql_pat}', '{repl}', 'g')"
    return out


_FP_BASE = np.uint64(1_000_003)


def _rolling_fp_batch(texts: pd.Series) -> pd.Series:
    """Polynomial rolling hash (Karp–Rabin style) over unicode code points,
    numpy-vectorized per document (wrapping uint64 arithmetic = mod 2^64).

    Defined over code points (not utf-8 bytes) so the DuckDB oracle can
    reproduce it exactly with ord() + HUGEINT Horner (rolling_fp_sql)."""

    def fp(s) -> int:
        if s is None:
            return 0
        b = np.frombuffer(str(s).encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if b.size == 0:
            return 0
        powers = np.empty(b.size, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if b.size > 1:
            np.multiply.accumulate(
                np.full(b.size - 1, _FP_BASE, dtype=np.uint64), out=powers[1:]
            )
        h = np.uint64(np.sum(b * powers[::-1], dtype=np.uint64))
        return int(h.astype(np.int64))

    return texts.map(fp)


def rolling_fingerprint(col: Column) -> Column:
    """Document fingerprint via a vectorized Arrow-batched pandas UDF — the
    pattern for logic the built-ins can't express (per input_hint: no
    per-row Python dispatch; batches cross the JVM↔Python boundary as Arrow
    buffers)."""
    fn = pandas_udf(_rolling_fp_batch, returnType=LongType())
    return fn(col)


def rolling_fp_sql(text_expr: str = "text") -> str:
    """DuckDB twin of rolling_fingerprint: Horner's rule over code points in
    HUGEINT, reduced mod 2^64, mapped to the signed long Spark returns."""
    horner = (
        f"list_reduce(list_transform(string_split({text_expr}, ''), "
        f"c -> CAST(ord(c) AS HUGEINT)), "
        f"(acc, c) -> (acc * {int(_FP_BASE)} + c) % 18446744073709551616)"
    )
    signed = (
        f"CASE WHEN ({horner}) >= 9223372036854775808 "
        f"THEN CAST(({horner}) - 18446744073709551616 AS BIGINT) "
        f"ELSE CAST(({horner}) AS BIGINT) END"
    )
    return (
        f"CASE WHEN {text_expr} IS NULL OR length({text_expr}) = 0 "
        f"THEN 0 ELSE ({signed}) END"
    )

# ---- intra-document repetition metrics (Gopher-style quality rules) ---------
#
# Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) filter
# training documents by repetition: the fraction of duplicate lines, the
# fraction of characters inside duplicate lines, and the fraction of
# characters covered by the most frequent word 2-gram. All three are pure
# in-row computations here — split/filter/aggregate higher-order built-ins
# over the line/token arrays, codegen'd, ZERO shuffle and zero Python — so at
# 100 TB they ride the corpus scan for free. Per-row cost is
# O(distinct·total) array comparisons, bounded by line/token counts of one
# document, never by corpus size. Each has an exact DuckDB list-lambda twin
# (same IEEE double ops, same 4-dp rounding — the quality_score parity
# pattern).


def _nonempty_lines(col: Column) -> Column:
    return F.filter(F.split(col, "\n"), lambda l: F.length(l) > 0)


def dup_line_frac(col: Column) -> Column:
    """Fraction of non-empty line occurrences that are duplicates of an
    earlier line: 1 - distinct/total. 0.0 for docs with no non-empty lines."""
    lines = _nonempty_lines(col)
    total = F.size(lines)
    dist = F.size(F.array_distinct(lines))
    return F.when(
        total > 0, F.round((total - dist).cast("double") / total.cast("double"), 4)
    ).otherwise(F.lit(0.0))


def dup_line_char_frac(col: Column) -> Column:
    """Fraction of characters (across non-empty lines) that sit inside lines
    occurring more than once — every occurrence of a duplicated line counts.

    Computed by run-length-scanning the SORTED line array (one aggregate
    with a (prev, run, acc) struct accumulator + a finish flush) instead of
    filter-counting every distinct line against the whole array: Catalyst
    higher-order lambdas are interpreted per element, so the old
    O(lines²) nesting dominated doc_repetition's oracle wall; this is
    O(lines log lines) for the identical value."""
    lines = _nonempty_lines(col)
    zero = F.lit(0).cast("long")
    chars_tot = F.aggregate(lines, zero, lambda a, l: a + F.length(l).cast("long"))

    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        zero.alias("acc"),
    )

    def merge(a, x):
        same = x == a["prev"]
        # a run just ended: flush run*len(prev) if the run was a dup group
        flushed = F.when(
            ~same & (a["run"] > 1), a["acc"] + a["run"] * F.length(a["prev"]).cast("long")
        ).otherwise(a["acc"])
        return F.struct(
            x.alias("prev"),
            F.when(same, a["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            flushed.alias("acc"),
        )

    def finish(a):
        return F.when(
            a["run"] > 1, a["acc"] + a["run"] * F.length(a["prev"]).cast("long")
        ).otherwise(a["acc"])

    dup_chars = F.aggregate(F.array_sort(lines), init, merge, finish)
    return F.when(
        chars_tot > 0,
        F.round(dup_chars.cast("double") / chars_tot.cast("double"), 4),
    ).otherwise(F.lit(0.0))


def top_bigram_char_frac(col: Column) -> Column:
    """Fraction of the document's characters covered by the most repeated
    word 2-gram: max over distinct bigrams of count·length(bigram), divided
    by length(text). Bigram length includes the single joining space (the
    bigrams are materialized with ' ' between tokens). 0.0 when the doc has
    fewer than two whitespace tokens."""
    toks = F.split(F.trim(col), r"\s+")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i.cast("int")),
            F.lit(" "),
            F.element_at(toks, (i + F.lit(1)).cast("int")),
        ),
    )
    # run-length scan over the SORTED bigram array: within a run of equal
    # bigrams the running cov = run·len(g) peaks at the run's end, so a
    # single (prev, run, best) aggregate computes max over distinct g of
    # count(g)·len(g) in O(B log B) — the old filter-per-distinct nesting
    # was O(B²) of interpreted lambda evals and alone cost ~29 s of the
    # 500-doc oracle sweep (measured round 4); value identical.
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1).cast("long"))
        cov = run * F.length(x).cast("long")
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a["best"], cov).alias("best"),
        )

    maxcov = F.aggregate(F.array_sort(bigrams), init, merge, lambda a: a["best"])
    return F.when(
        (F.length(col) > 0) & (F.size(toks) >= 2),
        F.round(maxcov.cast("double") / F.length(col).cast("double"), 4),
    ).otherwise(F.lit(0.0))


def _lines_sql(t: str) -> str:
    return f"list_filter(string_split({t}, chr(10)), l -> length(l) > 0)"


def dup_line_frac_sql(text_expr: str = "text") -> str:
    """DuckDB twin of dup_line_frac."""
    lines = _lines_sql(text_expr)
    return (
        f"CASE WHEN len({lines}) > 0 THEN "
        f"round(CAST(len({lines}) - len(list_distinct({lines})) AS DOUBLE) "
        f"/ CAST(len({lines}) AS DOUBLE), 4) ELSE 0.0 END"
    )


def dup_line_char_frac_sql(text_expr: str = "text") -> str:
    """DuckDB twin of dup_line_char_frac (nested list lambdas capture the
    outer variable exactly like Spark's higher-order functions)."""
    lines = _lines_sql(text_expr)
    chars_tot = f"list_sum(list_transform({lines}, l -> CAST(length(l) AS BIGINT)))"
    dup_chars = (
        f"coalesce(list_sum(list_transform(list_distinct({lines}), d -> "
        f"CASE WHEN len(list_filter({lines}, x -> x = d)) > 1 "
        f"THEN CAST(len(list_filter({lines}, x -> x = d)) AS BIGINT) "
        f"* CAST(length(d) AS BIGINT) ELSE CAST(0 AS BIGINT) END)), 0)"
    )
    return (
        f"CASE WHEN coalesce({chars_tot}, 0) > 0 THEN "
        f"round(CAST({dup_chars} AS DOUBLE) / CAST({chars_tot} AS DOUBLE), 4) "
        f"ELSE 0.0 END"
    )


def top_bigram_char_frac_sql(text_expr: str = "text") -> str:
    """DuckDB twin of top_bigram_char_frac (generate_series list form +
    1-based list indexing mirror Spark's sequence + element_at)."""
    t = text_expr
    toks = f"string_split_regex(trim({t}), '\\s+')"
    bigrams = (
        f"list_transform(generate_series(1, len({toks}) - 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1])"
    )
    maxcov = (
        f"list_max(list_transform(list_distinct({bigrams}), g -> "
        f"len(list_filter({bigrams}, x -> x = g)) * length(g)))"
    )
    return (
        f"CASE WHEN length({t}) > 0 AND len({toks}) >= 2 THEN "
        f"round(CAST({maxcov} AS DOUBLE) / CAST(length({t}) AS DOUBLE), 4) "
        f"ELSE 0.0 END"
    )


# ---- cross-document boilerplate line removal (C4-style) ---------------------
#
# Raffel et al. 2020 (C4) deduplicate at the LINE level: any line occurring
# in three or more documents is boilerplate (nav menus, cookie banners,
# footers) and every occurrence is dropped. Two passes: (1) one narrow hash
# aggregate over leaf-hashed lines counts distinct containing docs — corpus
# text never shuffles, only (hash, doc_id); (2) the small over-threshold set
# broadcasts into an anti join and each doc is rebuilt from its surviving
# lines (ONE shuffle keyed by doc id, payload = kept lines only). The leaf
# hash is pluggable exactly like MinHash: xxhash64 in production, sha2 for
# the bit-identical DuckDB oracle.


def remove_boilerplate_lines(
    df,
    *,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean_text",
    hash_fn: str = "xxhash64",
    broadcast_frequent: bool = True,
):
    """Drop every occurrence of any line appearing in >= ``min_docs`` distinct
    documents; returns (id, out_col, n_removed). Whitespace-only lines are
    never candidates (kept verbatim). NULL text is treated as ''. Line order
    is preserved; docs reduced to nothing come back as ''.

    ``broadcast_frequent`` forces the over-threshold hash set into a
    broadcast anti join — right for the typical curated-boilerplate scale
    (thousands of lines). A web-crawl corpus whose frequent set runs to
    tens of millions of hashes should pass False and let AQE plan the anti
    join as a shuffle (C4 itself resorted to approximate membership at that
    scale; 8 bytes/hash makes the exact set ~100 MB per 10M lines)."""
    from wprdc_etl_spark.functions.dedup import _leaf_hash

    text = F.coalesce(F.col(text_col), F.lit(""))
    lines_arr = F.split(text, "\n")
    ex = df.select(F.col(id_col), F.posexplode(lines_arr).alias("_pos", "_line"))
    cand = ex.where(F.length(F.trim("_line")) > 0)
    freq = (
        cand.select(F.col(id_col), _leaf_hash(F.col("_line"), hash_fn).alias("_h"))
        .groupBy("_h")
        .agg(F.countDistinct(id_col).alias("_n_docs"))
        .where(F.col("_n_docs") >= int(min_docs))
        .select("_h")
    )
    freq_side = F.broadcast(freq) if broadcast_frequent else freq
    kept = ex.join(
        freq_side, _leaf_hash(F.col("_line"), hash_fn) == F.col("_h"), "left_anti"
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_line"))).alias("_k"))
        .select(
            F.col(id_col),
            F.concat_ws("\n", F.transform("_k", lambda s: s["_line"])).alias(out_col),
            F.size("_k").cast("long").alias("_n_kept"),
        )
    )
    base = df.select(F.col(id_col), F.size(lines_arr).cast("long").alias("_n_lines"))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        (F.col("_n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("long").alias(
            "n_removed"
        ),
    )


def boilerplate_sql(
    relation: str,
    *,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_expr: str = "text",
) -> str:
    """DuckDB twin of remove_boilerplate_lines(hash_fn='sha2'): parallel
    unnest for (line, pos), the same distinct-doc threshold on the sha2 leaf
    hash, order-preserving string_agg rebuild. Returns
    (id, clean_text, n_removed)."""
    from wprdc_etl_spark.functions.dedup import leaf_hash_sql

    t = f"coalesce({text_expr}, '')"
    lines = f"string_split({t}, chr(10))"
    h = leaf_hash_sql("line")
    return (
        f"WITH _ex AS (SELECT {id_col}, unnest({lines}) AS line, "
        f"unnest(generate_series(1, len({lines}))) AS pos FROM {relation}), "
        f"_freq AS (SELECT {h} AS h FROM _ex WHERE length(trim(line)) > 0 "
        f"GROUP BY 1 HAVING count(DISTINCT {id_col}) >= {int(min_docs)}), "
        f"_kept AS (SELECT * FROM _ex WHERE {h} NOT IN (SELECT h FROM _freq)), "
        f"_reb AS (SELECT {id_col}, string_agg(line, chr(10) ORDER BY pos) AS clean_text, "
        f"count(*) AS n_kept FROM _kept GROUP BY {id_col}), "
        f"_base AS (SELECT {id_col}, CAST(len({lines}) AS BIGINT) AS n_lines FROM {relation}) "
        f"SELECT b.{id_col}, coalesce(r.clean_text, '') AS clean_text, "
        f"CAST(b.n_lines - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed "
        f"FROM _base b LEFT JOIN _reb r USING ({id_col})"
    )


# ---- cross-document paragraph dedup (keep first occurrence) -----------------
#
# RefinedWeb/MassiveText-style exact paragraph dedup: every repeated
# paragraph keeps its FIRST occurrence in corpus order (min (doc_id, pos))
# and drops all others — the complement of C4's frequency-threshold line
# removal above (which drops EVERY occurrence of frequent lines). Plan
# shape mirrors remove_boilerplate_lines: pass 1 computes winners on
# narrow (hash, doc_id, pos) rows — corpus text never shuffles — and the
# rebuild is one doc-keyed shuffle.


def dedup_paragraphs(
    df,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "clean_text",
    hash_fn: str = "xxhash64",
    min_chars: int = 1,
):
    """Keep only the first occurrence (lowest ``(doc_id, pos)``) of every
    exact-duplicate paragraph across the corpus; returns
    (id, out_col, n_removed). Paragraphs are ``\\n{2,}``-separated blocks;
    rebuild joins survivors with a canonical ``\\n\\n``. Blocks whose
    trimmed length is below ``min_chars`` are never dedup candidates (kept
    verbatim — guards bullet fragments / blank blocks). NULL text is ''.

    Scale shape: winners are ``min(struct(id, pos))`` per paragraph hash —
    a partial-aggregated narrow agg, so at most one ~24-byte row per
    (hash, map partition) shuffles; the paragraph TEXT crosses only the
    final doc-keyed rebuild exchange. min over a struct buffer plans as
    SortAggregate (declarative immutable buffer, same trade as the merge's
    LWW — see plans/lake.py), but the per-partition sort orders the narrow
    projection, never content bytes."""
    from wprdc_etl_spark.functions.dedup import _leaf_hash

    text = F.coalesce(F.col(text_col), F.lit(""))
    paras = F.split(text, r"\n{2,}")
    ex = df.select(F.col(id_col), F.posexplode(paras).alias("_pos", "_p"))
    cand = ex.where(F.length(F.trim("_p")) >= int(min_chars)).select(
        F.col(id_col),
        F.col("_pos"),
        F.col("_p"),
        _leaf_hash(F.col("_p"), hash_fn).alias("_h"),
    )
    winners = (
        cand.select("_h", F.struct(F.col(id_col), F.col("_pos")).alias("_occ"))
        .groupBy("_h")
        .agg(F.min("_occ").alias("_w"))
    )
    kept_cand = (
        cand.join(winners, "_h")
        .where(
            (F.col("_w")[id_col] == F.col(id_col))
            & (F.col("_w")["_pos"] == F.col("_pos"))
        )
        .select(id_col, "_pos", "_p")
    )
    kept_short = ex.where(F.length(F.trim("_p")) < int(min_chars)).select(
        id_col, "_pos", "_p"
    )
    rebuilt = (
        kept_cand.unionByName(kept_short)
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_p"))).alias("_k"))
        .select(
            F.col(id_col),
            F.concat_ws("\n\n", F.transform("_k", lambda s: s["_p"])).alias(out_col),
            F.size("_k").cast("long").alias("_n_kept"),
        )
    )
    base = df.select(F.col(id_col), F.size(paras).cast("long").alias("_n_paras"))
    return base.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
        (F.col("_n_paras") - F.coalesce(F.col("_n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def paragraph_dedup_sql(
    relation: str,
    *,
    id_col: str = "doc_id",
    text_expr: str = "text",
    min_chars: int = 1,
) -> str:
    """DuckDB twin of ``dedup_paragraphs(hash_fn='sha2')``: same
    ``\\n{2,}`` split, winner = ``rank() = 1`` over
    ``(doc_id, pos)`` per sha2 paragraph hash — an independent construction
    of the same first-occurrence rule. Returns (id, clean_text,
    n_removed)."""
    from wprdc_etl_spark.functions.dedup import leaf_hash_sql

    t = f"coalesce({text_expr}, '')"
    paras = rf"regexp_split_to_array({t}, '\n{{2,}}')"
    h = leaf_hash_sql("para")
    mc = int(min_chars)
    return (
        f"WITH _ex AS (SELECT {id_col}, unnest({paras}) AS para, "
        f"unnest(generate_series(1, len({paras}))) AS pos FROM {relation}), "
        f"_cand AS (SELECT {id_col}, pos, para, "
        f"rank() OVER (PARTITION BY {h} ORDER BY {id_col}, pos) AS rk "
        f"FROM _ex WHERE length(trim(para)) >= {mc}), "
        f"_kept AS (SELECT {id_col}, pos, para FROM _cand WHERE rk = 1 "
        f"UNION ALL SELECT {id_col}, pos, para FROM _ex "
        f"WHERE length(trim(para)) < {mc}), "
        f"_reb AS (SELECT {id_col}, string_agg(para, chr(10) || chr(10) "
        f"ORDER BY pos) AS clean_text, count(*) AS n_kept "
        f"FROM _kept GROUP BY {id_col}), "
        f"_base AS (SELECT {id_col}, CAST(len({paras}) AS BIGINT) AS n_paras "
        f"FROM {relation}) "
        f"SELECT b.{id_col}, coalesce(r.clean_text, '') AS clean_text, "
        f"CAST(b.n_paras - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed "
        f"FROM _base b LEFT JOIN _reb r USING ({id_col})"
    )


# ---- markup stripping (HTML / Markdown → clean training text) ---------------
#
# Crawl-derived corpora arrive as HTML or Markdown; the standard ingest
# normalization strips tags, comments, script/style payloads, link syntax
# and entities before quality scoring / dedup. Rules are an ordered
# regexp_replace chain in the RE2∩Java subset (no lookaround, no pattern
# backreferences — RE2 has none), so Spark and DuckDB replace the exact
# same spans; only the replacement group syntax differs ($1 vs \1), which
# is why each rule carries both forms. JVM-codegen'd, zero Python.
MARKUP_RULES: list[tuple[str, str, str]] = [
    # (pattern, spark replacement, duckdb replacement)
    (r"<!--[\s\S]*?-->", "", ""),                        # HTML comments
    (r"<script[\s\S]*?</script>", "", ""),               # script payloads
    (r"<style[\s\S]*?</style>", "", ""),                 # style payloads
    (r"!?\[([^\]]*)\]\([^)]*\)", "$1", r"\1"),           # md links/images
    (r"<[^>]+>", " ", " "),                              # remaining tags → space

    (r"(?m)^#{1,6}[ \t]*", "", ""),                      # md headings
    (r"\*{1,3}([^*]+)\*{1,3}", "$1", r"\1"),             # md emphasis
    (r"`", "", ""),                                      # inline code marks
    (r"&amp;", "&", "&"),                                # entities (after tag strip)
    (r"&lt;", "<", "<"),
    (r"&gt;", ">", ">"),
    (r"&quot;", "\"", "\""),
    (r"&#39;", "'", "'"),
    (r"&nbsp;", " ", " "),
    (r"[ \t]{2,}", " ", " "),                            # collapse runs
    (r"\n{3,}", "\n\n", "\n\n"),                         # collapse blank lines
]


def strip_markup(col: Column) -> Column:
    """HTML/Markdown → clean text via the ordered MARKUP_RULES chain, then
    trim. One fused whole-stage-codegen expression per row."""
    out = col
    for pat, spark_repl, _ in MARKUP_RULES:
        out = F.regexp_replace(out, pat, spark_repl)
    return F.trim(out)


def strip_markup_sql(text_expr: str = "text") -> str:
    """DuckDB twin of strip_markup (global flag; RE2 replacement \\1 group
    refs; identical rule order)."""
    out = text_expr
    for pat, _, duck_repl in MARKUP_RULES:
        sql_pat = pat.replace("'", "''")
        sql_repl = duck_repl.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{sql_pat}', '{sql_repl}', 'g')"
    return f"trim({out})"


# ---- TF-IDF keyword extraction ----------------------------------------------
#
# Per-document top-k salient terms by tf·idf. The idf here is the LINEAR
# rarity N/df rather than ln(N/df): log implementations are not bit-specified
# across engines (libm vs RE2-era musl differ in ULPs), while IEEE
# multiply/divide are exactly rounded everywhere — so the Spark and DuckDB
# scores compare EXACTLY, ranking included. Monotonicity in df is identical,
# so top-k sets match the ln variant whenever tf ties don't straddle the
# transform (and a deterministic (score DESC, term ASC) tiebreak pins the
# rest).
#
# Scale shape: two NARROW shuffles — (doc, term) tf counts with map-side
# combine, then (term) doc-frequency counts — followed by a term-keyed join
# (the post-min_df dictionary is vocabulary-sized; AQE broadcasts it when it
# fits) and a WindowGroupLimit top-k that prunes every map partition to its
# local k before the final shuffle. Corpus text never moves: only hashed-
# width (doc, term, count) rows shuffle.


def top_terms_per_doc(
    df,
    *,
    k: int = 5,
    n_docs: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
    min_df: int = 1,
):
    """Top-k terms per document by tf·(N/df); returns
    (id, term, tf, df, score, rank). Terms are maximal ``[a-z]{min_term_len,}``
    runs of the lowercased text. ``n_docs`` (the corpus size N) is counted
    with one cheap action when not supplied."""
    from wprdc_etl_spark.operators.analytics import topk_per_group

    if n_docs is None:
        n_docs = df.count()
    pat = f"[a-z]{{{int(min_term_len)},}}"
    tf = (
        df.select(
            F.col(id_col),
            F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), 0)).alias(
                "term"
            ),
        )
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        docfreq = docfreq.where(F.col("df") >= int(min_df))
    scored = tf.join(docfreq, "term").withColumn(
        "score",
        F.round(F.col("tf") * (F.lit(float(n_docs)) / F.col("df")), 4),
    )
    out = topk_per_group(
        scored,
        group=[id_col],
        order_by=[F.col("score").desc(), F.col("term").asc()],
        k=k,
    )
    return out.select(id_col, "term", "tf", "df", "score", "rank")


def top_terms_sql(
    relation: str,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_expr: str = "text",
    min_term_len: int = 2,
    min_df: int = 1,
) -> str:
    """DuckDB twin of top_terms_per_doc — recomputes N itself (same double
    division/multiplication, same rounding, same tiebreak)."""
    pat = f"[a-z]{{{int(min_term_len)},}}"
    return (
        f"WITH _tok AS (SELECT {id_col}, "
        f"unnest(regexp_extract_all(lower({text_expr}), '{pat}')) AS term "
        f"FROM {relation}), "
        f"_tf AS (SELECT {id_col}, term, count(*) AS tf FROM _tok GROUP BY 1, 2), "
        f"_df AS (SELECT term, count(*) AS df FROM _tf GROUP BY 1 "
        f"HAVING count(*) >= {int(min_df)}), "
        f"_n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {relation}), "
        f"_sc AS (SELECT t.{id_col}, t.term, t.tf, d.df, "
        f"round(t.tf * ((SELECT n FROM _n) / d.df), 4) AS score "
        f"FROM _tf t JOIN _df d USING (term)) "
        f"SELECT {id_col}, term, tf, df, score, rank FROM ("
        f"SELECT *, CAST(row_number() OVER (PARTITION BY {id_col} "
        f"ORDER BY score DESC, term ASC) AS INT) AS rank FROM _sc) "
        f"WHERE rank <= {int(k)}"
    )


# ---- vocabulary building ----------------------------------------------------


def build_vocab(
    df,
    *,
    text_col: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
    min_term_len: int = 2,
):
    """Corpus vocabulary with deterministic ids: (term, term_id, count),
    ids assigned by (count DESC, term ASC) — the tokenizer-training /
    embedding-table precursor.

    Scale shape: ONE narrow (term, count) hash aggregate with map-side
    combine over in-row-extracted terms (corpus text never shuffles), then
    the id ranking runs on the POST-THRESHOLD vocabulary — vocabulary-sized
    data (a single-partition window is fine at any corpus scale; vocabulary
    grows ~log corpus). ``max_size`` caps the vocab at the top ids."""
    from pyspark.sql import Window

    pat = f"[a-z]{{{int(min_term_len)},}}"
    counts = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), 0)
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= int(min_count))
    )
    w = Window.orderBy(F.col("count").desc(), F.col("term").asc())
    out = counts.withColumn("term_id", F.row_number().over(w).cast("long"))
    if max_size is not None:
        out = out.where(F.col("term_id") <= int(max_size))
    return out.select("term", "term_id", "count")


def vocab_sql(
    relation: str,
    *,
    text_expr: str = "text",
    min_count: int = 1,
    max_size: int | None = None,
    min_term_len: int = 2,
) -> str:
    """DuckDB twin of build_vocab."""
    pat = f"[a-z]{{{int(min_term_len)},}}"
    cap = f"WHERE term_id <= {int(max_size)}" if max_size is not None else ""
    return (
        f"SELECT term, term_id, count FROM ("
        f"SELECT term, count, CAST(row_number() OVER "
        f"(ORDER BY count DESC, term ASC) AS BIGINT) AS term_id FROM ("
        f"SELECT term, count(*) AS count FROM ("
        f"SELECT unnest(regexp_extract_all(lower({text_expr}), '{pat}')) AS term "
        f"FROM {relation}) GROUP BY term HAVING count(*) >= {int(min_count)})) {cap}"
    )


# ---------------------------------------------------------------------------
# Unicode canonicalization + unigram-LM quality scoring
# ---------------------------------------------------------------------------

# ASCII whitespace only, deliberately: Java regex \s, Python re \s and
# DuckDB/RE2 \s disagree on Unicode whitespace (NBSP etc.), so the engine and
# the oracle share one explicit class instead. Vertical tab is spelled \x0B,
# not \v: Java regex reads \v as the ENTIRE vertical-whitespace class
# (adding \x85 U+2028 U+2029) while Python re and RE2 read it as \x0B only —
# \x0B means the same single character in all three.
_ASCII_WS_RUN = r"[ \t\n\r\f\x0B]+"
_CTRL_CLASS = r"[\x00-\x1f\x7f]"


def _normalize_batch(texts: pd.Series) -> pd.Series:
    """NFC-normalize + strip control chars + collapse ASCII whitespace,
    fully pandas-vectorized (no per-row Python dispatch). Nulls stay null."""
    mask = texts.isna()
    s = texts.fillna("").astype(str).str.normalize("NFC")
    s = s.str.replace(_CTRL_CLASS, " ", regex=True)
    s = s.str.replace(_ASCII_WS_RUN, " ", regex=True)
    s = s.str.strip(" ")
    s[mask] = None
    return s


def normalize_text(col: Column) -> Column:
    """Unicode text canonicalization for training corpora: NFC composition
    (e + U+0301 -> é), control characters to spaces, ASCII-whitespace runs
    collapsed, edges trimmed. Spark has no built-in NFC, so this is the
    sanctioned Arrow-batched pandas-UDF escape hatch (same shape as
    rolling_fingerprint); everything else in the pipeline stays JVM-side."""
    from pyspark.sql.types import StringType

    fn = pandas_udf(_normalize_batch, returnType=StringType())
    return fn(col)


def normalize_text_sql(text_expr: str = "text") -> str:
    """DuckDB twin of normalize_text (nfc_normalize is built in)."""
    return (
        f"trim(regexp_replace(regexp_replace(nfc_normalize({text_expr}), "
        f"'{_CTRL_CLASS}', ' ', 'g'), '{_ASCII_WS_RUN}', ' ', 'g'), ' ')"
    )


def unigram_logprob(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet-style LM quality proxy: score(doc) = avg over tokens of
    -ln p(token), with p() the corpus unigram MLE. Low score = stereotypical
    text, high = rare-token soup; training pipelines band on it.

    100 TB shape: tokenize/explode is narrow map-side work; the unigram
    count is ONE hash aggregate with map-side partial combine (vocab-sized
    result — Zipf keeps real-corpus vocabs in the low millions, broadcast
    range); scoring joins the broadcast dictionary back to the token stream
    and reduces per doc in a second hash aggregate. No sort anywhere; the
    only wide exchanges are the two keyed aggs. If a vocab ever outgrows the
    broadcast threshold, drop the F.broadcast hint and Catalyst falls back
    to a shuffle join on `tok` — same semantics.

    Docs whose text trims to empty contribute no tokens and drop out of the
    result, matching the SQL twin exactly.
    """
    toks = (
        df.select(
            id_col,
            F.explode(F.split(F.trim(F.col(text_col)), _ASCII_WS_RUN)).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select(id_col, F.lower(F.col("tok")).alias("tok"))
    )
    counts = toks.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(counts), "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4).alias("lm_score"),
            F.count("*").alias("n_tokens"),
        )
    )


def unigram_logprob_sql(
    relation: str,
    *,
    text_expr: str = "text",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of unigram_logprob. Counts sum exactly (integer-valued
    doubles < 2^53), ln differs from the JVM by <= 1 ulp, and the 4-dp round
    absorbs the summation-order noise — same contract as the other
    rounded-double twins."""
    return (
        f"WITH toks AS ("
        f"  SELECT {id_expr} AS doc_id, lower(tok) AS tok FROM ("
        f"    SELECT {id_expr}, unnest(string_split_regex(trim({text_expr}), "
        f"'{_ASCII_WS_RUN}')) AS tok FROM {relation}) t WHERE tok <> ''"
        f"), cnt AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c FROM toks GROUP BY tok)"
        f", tot AS (SELECT sum(c) AS t FROM cnt) "
        f"SELECT doc_id, round(avg(-ln(c / t)), 4) AS lm_score, "
        f"count(*) AS n_tokens "
        f"FROM toks JOIN cnt USING (tok) CROSS JOIN tot GROUP BY doc_id"
    )
