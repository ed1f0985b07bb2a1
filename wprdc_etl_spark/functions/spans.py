"""Exact-substring repeated-span detection and removal (corpus-level).

The training-data dedup family of Lee et al. 2021 ("Deduplicating Training
Data Makes Language Models Better"): find every span of >= `window`
characters that occurs at least `min_count` times ANYWHERE in the corpus
(across documents or within one), report the merged spans per document, and
optionally cut them out of the text. Distinct from the per-document ops in
functions/dedup.py (MinHash/SimHash near-dup match whole documents; this
finds the duplicated *regions* inside otherwise-unique documents — licence
headers, boilerplate banners, copy-pasted functions).

Spark-first shape (the 100-TB story):

1. **Window hashing** — one Arrow-batched pandas UDF per document computes a
   Karp–Rabin rolling hash for every w-char window in O(len) numpy ops
   (w vectorized passes over the code-point array, no per-window substring
   materialization). Only (pos, hash) pairs leave the row.
2. **Winnowing (optional)** — Schleimer et al. 2003 (MOSS): keep only the
   rightmost-minimal hash of each k-consecutive-hash window. Guarantees any
   common substring of length >= window + k - 1 still shares a selected
   fingerprint, while thinning the exploded rows to ~2/(k+1) of positions —
   the knob that keeps the shuffle linear-in-corpus but small at 100 TB.
   k=1 = keep everything (exact for matches >= window).
3. **Candidate join** — explode to narrow (doc_id, pos, hash) rows, ONE hash
   aggregation finds hashes seen >= min_count times, join back. All narrow;
   the text column never enters these shuffles.
4. **Verification** — candidate positions are regrouped per document (one
   array row per doc), joined to the text ONCE, and the w-char window text
   is materialized in-row only for candidates; a final group-by on the
   window text makes the result EXACT — a 64-bit hash collision can create
   a candidate but never a false duplicate. (Same late-materialize shape as
   the LSH -> Jaccard verifier in functions/dedup.py.)
5. **Span merge** — duplicated window positions per doc collapse into
   maximal contiguous spans with one keyed window (gaps-and-islands).
6. **Removal** — spans aggregate to one sorted array per doc; the cleaned
   text is rebuilt in-row by a single ``F.aggregate`` over the gaps (no
   char-level explosion).

DuckDB twins (oracle): windows via generate_series + substr grouped by the
window TEXT itself — hash-free, so the oracle is fully independent of the
engine's hashing; spans/removal replay the same island/gap SQL.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_B = np.uint64(1_000_003)  # same base as functions/text.py rolling hash


def _fingerprint_batch(window: int, winnow_k: int):
    """pandas-UDF body: per text, array of selected (pos, hash) structs.
    pos is 1-based (substring() convention in both Spark and DuckDB)."""

    def go(texts: pd.Series) -> pd.Series:
        def fps(s):
            if s is None:
                return []
            cp = np.frombuffer(
                str(s).encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
            n = cp.size
            if n < window:
                return []
            m = n - window + 1
            h = np.zeros(m, dtype=np.uint64)
            for j in range(window):  # w vectorized passes, O(len) total
                h = h * _B + cp[j : j + m]
            if winnow_k > 1 and m > winnow_k:
                sw = np.lib.stride_tricks.sliding_window_view(h, winnow_k)
                # rightmost minimal hash per k-window (standard winnowing
                # tie-break): argmin over the reversed window
                idx = (winnow_k - 1) - np.argmin(sw[:, ::-1], axis=1)
                pos = np.unique(np.arange(sw.shape[0]) + idx)
                h = h[pos]
            else:
                pos = np.arange(m)
            hs = h.astype(np.int64)
            return [
                {"pos": int(p) + 1, "h": int(v)} for p, v in zip(pos, hs)
            ]

        return texts.map(fps)

    return go


def window_fingerprints(
    docs: DataFrame,
    *,
    window: int,
    winnow_k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, h) for every selected w-char window. One Arrow crossing;
    only narrow rows leave the document."""
    fn = pandas_udf(
        _fingerprint_batch(window, winnow_k),
        returnType="array<struct<pos:int,h:bigint>>",
    )
    return (
        docs.select(id_col, F.explode(fn(F.col(text_col))).alias("_pw"))
        .select(id_col, F.col("_pw.pos").alias("pos"), F.col("_pw.h").alias("h"))
    )


def repeated_windows(
    docs: DataFrame,
    *,
    window: int,
    min_count: int = 2,
    winnow_k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos) of every selected window whose w-char text occurs at least
    `min_count` times in the corpus — VERIFIED on the window text, so exact
    regardless of hash collisions."""
    fp = window_fingerprints(
        docs, window=window, winnow_k=winnow_k, id_col=id_col, text_col=text_col
    )
    dup_h = (
        fp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("h")
    )
    cand = fp.join(dup_h, "h").select(id_col, "pos")
    # late-materialize window text: candidate positions regrouped per doc,
    # text joined ONCE per doc, windows cut in-row — document bytes never
    # fan out across candidate rows
    per_doc = cand.groupBy(id_col).agg(F.collect_list("pos").alias("_ps"))
    wins = (
        per_doc.join(docs.select(id_col, text_col), id_col)
        .select(
            id_col,
            F.explode(
                F.transform(
                    "_ps",
                    lambda p: F.struct(
                        p.alias("pos"),
                        F.col(text_col).substr(p, F.lit(window)).alias("win"),
                    ),
                )
            ).alias("_w"),
        )
        .select(id_col, F.col("_w.pos").alias("pos"), F.col("_w.win").alias("win"))
    )
    dup_w = (
        wins.groupBy("win")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("win")
    )
    return wins.join(dup_w, "win").select(id_col, "pos")


def repeated_spans(
    docs: DataFrame,
    *,
    window: int,
    min_count: int = 2,
    winnow_k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, span_start, span_len): maximal merged spans of duplicated
    windows per document (1-based, inclusive). Windows at p and q (p < q)
    merge iff q <= p + window (their char ranges touch or overlap)."""
    rw = repeated_windows(
        docs,
        window=window,
        min_count=min_count,
        winnow_k=winnow_k,
        id_col=id_col,
        text_col=text_col,
    )
    w_ = Window.partitionBy(id_col).orderBy("pos")
    lagp = F.lag("pos").over(w_)
    rw = rw.withColumn(
        "_nf",
        F.when(lagp.isNull() | (F.col("pos") > lagp + window), 1).otherwise(0),
    ).withColumn("_isl", F.sum("_nf").over(w_))
    return (
        rw.groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window - 1).alias("_end"),
        )
        .select(
            id_col,
            "span_start",
            (F.col("_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def remove_repeated_spans(
    docs: DataFrame,
    *,
    window: int,
    min_count: int = 2,
    winnow_k: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The Lee-et-al transform: documents with every duplicated span cut
    out (all other columns preserved, `text_col` replaced). Docs with no
    duplicated span pass through untouched. The rebuild is one in-row
    ``F.aggregate`` over the doc's sorted span array — gaps are concatenated
    left to right, no per-character explosion, ONE keyed shuffle to group
    spans plus the join back to the documents."""
    spans = repeated_spans(
        docs,
        window=window,
        min_count=min_count,
        winnow_k=winnow_k,
        id_col=id_col,
        text_col=text_col,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_len"))
        ).alias("_spans")
    )
    txt = F.col(text_col)
    # accumulator: (cur = next uncut 1-based position, acc = kept prefix)
    rebuilt = F.aggregate(
        F.col("_spans"),
        F.struct(F.lit(1).alias("cur"), F.lit("").alias("acc")),
        lambda a, s: F.struct(
            F.greatest(a.cur, s.span_start + s.span_len).alias("cur"),
            F.concat(
                a.acc,
                F.when(
                    s.span_start > a.cur,
                    txt.substr(a.cur, s.span_start - a.cur),
                ).otherwise(F.lit("")),
            ).alias("acc"),
        ),
        lambda a: F.concat(a.acc, txt.substr(a.cur, F.length(txt) - a.cur + 1)),
    )
    out = docs.join(per_doc, id_col, "left")
    keep = [c for c in docs.columns if c != text_col]
    return out.select(
        *keep,
        F.when(F.col("_spans").isNull(), txt).otherwise(rebuilt).alias(text_col),
    )


# ---------------------------------------------------------------------------
# DuckDB twins (hash-free: windows grouped by their TEXT, fully independent
# of the engine's rolling hash / verification path)
# ---------------------------------------------------------------------------


def _wins_cte(rel: str, window: int, min_count: int) -> str:
    return f"""
wins AS (
  SELECT doc_id, gs.pos, substr(text, gs.pos, {window}) AS win
  FROM {rel},
       LATERAL (SELECT unnest(generate_series(
           1, greatest(length(text) - {window} + 1, 0))) AS pos) gs
), dupw AS (
  SELECT win FROM wins GROUP BY win HAVING count(*) >= {min_count}
), dpos AS (
  SELECT doc_id, pos FROM wins JOIN dupw USING (win)
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {window} THEN 1 ELSE 0 END AS nf
  FROM dpos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), isl2 AS (
  SELECT doc_id, pos,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
), spans AS (
  SELECT doc_id, min(pos) AS span_start,
         max(pos) + {window} - 1 AS span_end
  FROM isl2 GROUP BY doc_id, island
)""".strip()


def repeated_spans_sql(rel: str, *, window: int, min_count: int = 2) -> str:
    """Oracle for repeated_spans (winnow_k=1)."""
    return f"""
WITH {_wins_cte(rel, window, min_count)}
SELECT doc_id, span_start,
       span_end - span_start + 1 AS span_len
FROM spans
""".strip()


def remove_repeated_spans_sql(rel: str, *, window: int, min_count: int = 2) -> str:
    """Oracle for remove_repeated_spans (winnow_k=1): gap rows via lag over
    the spans, stitched back with an ordered string_agg. A doc whose text is
    entirely covered keeps a '' text (handled by the spans-exists case)."""
    return f"""
WITH {_wins_cte(rel, window, min_count)},
sord AS (
  SELECT doc_id, span_start, span_end,
         lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start) AS pe
  FROM spans
), gaps AS (
  SELECT doc_id, coalesce(pe + 1, 1) AS gs, span_start - 1 AS ge FROM sord
  UNION ALL
  SELECT sp.doc_id, max(sp.span_end) + 1 AS gs, max(length(d.text)) AS ge
  FROM spans sp JOIN {rel} d USING (doc_id) GROUP BY sp.doc_id
), clean AS (
  SELECT g.doc_id,
         string_agg(substr(d.text, g.gs, g.ge - g.gs + 1), '' ORDER BY g.gs) AS t
  FROM gaps g JOIN {rel} d USING (doc_id)
  WHERE g.ge >= g.gs GROUP BY g.doc_id
)
SELECT d.doc_id,
       CASE WHEN s.doc_id IS NULL THEN d.text ELSE coalesce(c.t, '') END AS text
FROM {rel} d
LEFT JOIN (SELECT DISTINCT doc_id FROM spans) s USING (doc_id)
LEFT JOIN clean c ON c.doc_id = d.doc_id
""".strip()
