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
