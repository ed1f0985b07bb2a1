"""Deterministic fixture generation (FIXTURES.md §1–§3).

Synthesizes the ``source_code`` table and the ordered ``change_events`` CDC
log entirely with Spark column expressions over ``spark.range(n)`` — no
driver-side loops, no windows, no wall-clock, no RNG state. Every column is a
closed-form function of the row index ``i`` (via ``xxhash64`` / ``sha2``), so
generation is embarrassingly parallel and reproducible at any scale: the same
(seed, n) always yields the same rows, which makes golden sha256 final states
stable (FIXTURES.md preamble).

Reference parity: this replaces the reference's checked-in ``test/mock/*.csv``
fixtures (SURVEY.md §6.1) with generated tables; anomaly injection mirrors the
behaviors the reference tests exercise (repeated headers → here redeliveries;
marshmallow validation errors → here quarantine rows).

Anomaly mix (FIXTURES.md §2): ~70% I / 25% U / 5% D; ~3% verbatim
redeliveries (same event_sequence — dedup fodder); ~1% late events
(event_ts pulled one day early); ~1% invalid rows (null content on op!='D',
unknown or whitespace-padded lang); final 10% of the sequence carries a
``license`` column when ``include_license=True`` (schema-evolution phase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
BASE_EPOCH = 1_700_000_000  # 2023-11-14T22:13:20Z — fixed, not wall-clock

LANGS = ["py", "java", "scala", "js", "go", "rs", "md"]
EXTS = {"py": "py", "java": "java", "scala": "scala", "js": "js", "go": "go", "rs": "rs", "md": "md"}

#: Columns of the change-event log, in canonical order (FIXTURES.md §2).
EVENT_COLUMNS = ["event_sequence", "event_ts", "op", "repo", "path", "commit", "lang", "content"]


def _h(tag: str, *cols) -> F.Column:
    """Deterministic 64-bit hash of (tag, seed, *cols) — the generator's PRNG."""
    return F.xxhash64(F.lit(tag), F.lit(SEED), *cols)


def _pm(tag: str, mod: int, *cols) -> F.Column:
    return F.pmod(_h(tag, *cols), F.lit(mod))


def _entity_cols(e: F.Column) -> dict[str, F.Column]:
    """repo/path/lang for entity id ``e``.

    ~30% of entities live in one hot mega-repo (skew fixture, SURVEY §8.3 #4);
    the rest spread over 7×97 org/repo combos. (repo, path) is unique per
    entity because the path embeds ``e``.
    """
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (F.pmod(e, F.lit(7)) + 1).cast("int"))
    repo = F.when(
        _pm("hot", 100, e) < 30, F.lit("mega/monorepo")
    ).otherwise(F.concat(F.lit("org"), F.pmod(e, F.lit(7)), F.lit("/repo"), F.pmod(e, F.lit(97))))
    path = F.concat(F.lit("src/d"), F.pmod(e, F.lit(57)), F.lit("/f"), e, F.lit("."), lang)
    return {"repo": repo, "path": path, "lang": lang}


def gen_source_code(spark: SparkSession, n_rows: int) -> DataFrame:
    """The primary input table per BASELINE.json ``input_hint``:
    ``(repo:string, path:string, commit:string, lang:string, content:string)``.
    """
    df = spark.range(n_rows).withColumnRenamed("id", "i")
    e = F.col("i")
    ent = _entity_cols(e)
    commit = F.substring(F.sha2(F.concat_ws(":", F.lit("c"), e, F.lit(0)), 256), 1, 40)
    chunk = F.substring(F.sha2(F.concat_ws(":", F.lit("x"), e, F.lit(0), e), 256), 1, 32)
    content = F.repeat(chunk, (_pm("len", 150, e) + 2).cast("int"))
    return df.select(
        ent["repo"].alias("repo"),
        ent["path"].alias("path"),
        commit.alias("commit"),
        ent["lang"].alias("lang"),
        content.alias("content"),
    )


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    *,
    include_license: bool = False,
    with_anomalies: bool = True,
    n_entities: int | None = None,
    content_reps_max: int = 150,
    start: int = 0,
) -> DataFrame:
    """The ordered CDC log (FIXTURES.md §2). Closed-form per event index.

    Key design point: ``commit`` is a function of (entity, version) with
    version ∈ {0,1,2}, so *distinct events can target the same
    (repo, path, commit) key with different content* — which is exactly what
    makes last-writer-wins-by-sequence (SURVEY B4) observable, and makes a
    delete referencing a real key without any generation-time join.
    Whether a 'D' outranks the key's other events is decided purely by
    event_sequence, identically in the engine and the DuckDB oracle.

    ``start`` shifts the sequence window: events [start, start+n_events).
    Because every column is a pure function of the event index ``i``,
    chunk-wise generation is exactly equal to the same slice of a full-log
    generation — which is what lets the rolling-log replay anchor
    (scripts/replay_anchor_rolling.py) materialize a 10^9-event log one
    segment at a time inside a bounded disk budget. ``n_entities`` must be
    passed explicitly when chunking (the default derives from ``n_events``,
    which is per-chunk here). Not combinable with ``include_license``
    (its 90%-boundary is defined against a [0, n_events) log).
    """
    if include_license and start:
        raise ValueError("include_license is defined for start=0 logs only")
    n_entities = n_entities or max(64, n_events // 3)
    df = spark.range(start, start + n_events).withColumnRenamed("id", "i")
    i = F.col("i")

    r_op = _pm("op", 100, i)
    op = F.when(r_op < 70, F.lit("I")).when(r_op < 95, F.lit("U")).otherwise(F.lit("D"))
    e = _pm("ent", n_entities, i)
    v = _pm("ver", 3, i)
    ent = _entity_cols(e)
    commit = F.substring(F.sha2(F.concat_ws(":", F.lit("c"), e, v), 256), 1, 40)
    chunk = F.substring(F.sha2(F.concat_ws(":", F.lit("x"), e, v, i), 256), 1, 32)
    content = F.when(op == "D", F.lit(None).cast("string")).otherwise(
        F.repeat(chunk, (_pm("len", content_reps_max, i) + 2).cast("int"))
    )
    lang = ent["lang"]

    ts_sec = F.lit(BASE_EPOCH) + i
    if with_anomalies:
        # ~1% late events: timestamp pulled a day earlier than sequence position.
        ts_sec = F.when(_pm("late", 100, i) < 1, ts_sec - F.lit(86_400)).otherwise(ts_sec)
        # ~1% invalid rows, three variants (op!='D' only, so D stays applyable):
        r_bad = _pm("bad", 300, i)
        content = F.when((r_bad == 0) & (op != "D"), F.lit(None).cast("string")).otherwise(content)
        lang = F.when((r_bad == 1) & (op != "D"), F.lit("klingon")).otherwise(
            F.when((r_bad == 2) & (op != "D"), F.concat(F.lit("  "), lang, F.lit(" "))).otherwise(lang)
        )

    cols = [
        i.alias("event_sequence"),
        F.timestamp_seconds(ts_sec).alias("event_ts"),
        op.alias("op"),
        ent["repo"].alias("repo"),
        ent["path"].alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    ]
    if include_license:
        # Schema-evolution phase: last 10% of the sequence carries a license.
        lic = F.when(
            i >= int(n_events * 0.9),
            F.concat(F.lit("lic-"), _pm("lic", 5, i)),
        ).otherwise(F.lit(None).cast("string"))
        cols.append(lic.alias("license"))
    out = df.select(*cols)

    if with_anomalies:
        # ~3% verbatim redeliveries: the same row (same event_sequence) again.
        dup = out.where(_pm("dup", 100, F.col("event_sequence")) < 3)
        out = out.unionAll(dup)
    return out


#: Shared boilerplate paragraph (~40 tokens) planted in ~30% of generated
#: docs — the skew stressor for shingle/LSH band distributions (a handful of
#: shingles occur in 300k docs at n=10⁶) and fodder for paragraph-dedup and
#: repeated-span removal at scale.
DOC_BOILER = " ".join(f"b{i % 17}" for i in range(40))

_DOC_VOCAB_N = 1000


def _doc_word(tag: str, *cols) -> F.Column:
    """One Zipf-ish vocab token: u = hash/1e6 in [0,1), idx = ⌊V·u^2.5⌋ —
    low-index words dominate (w0 ≈ 6% of tokens), matching the skewed
    shingle distributions real corpora show."""
    u = _pm(tag, 1_000_000, *cols).cast("double") / F.lit(1_000_000.0)
    idx = F.floor(F.lit(float(_DOC_VOCAB_N)) * F.pow(u, F.lit(2.5))).cast("int")
    return F.concat(F.lit("w"), F.least(idx, F.lit(_DOC_VOCAB_N - 1)))


def _doc_para(cid: F.Column, j: int) -> F.Column:
    """Paragraph ``j`` of content-id ``cid``: 15–39 Zipf tokens, closed-form."""
    nw = (F.lit(15) + _pm("nw", 25, cid, F.lit(j))).cast("int")
    words = F.transform(
        F.sequence(F.lit(0), nw - 1),
        lambda i: _doc_word("w", cid, F.lit(j), i),
    )
    return F.array_join(words, " ")


def gen_documents(spark: SparkSession, n_docs: int) -> DataFrame:
    """Large synthetic ``documents``-shaped corpus (doc_id, text, lang,
    source, n_chars) for at-scale anchors of the training-data tier —
    same closed-form xxhash64 PRNG as the CDC generator, so any n is
    reproducible and embarrassingly parallel (no driver loops, no RNG state).

    Planted structure (all deterministic):
      - ~20% of docs are NEAR-duplicates: content derived from a nearby base
        doc id with a short mutation suffix — shares all but one paragraph of
        shingles (MinHash-LSH / SimHash / incremental-index recall fodder);
      - ~30% carry the shared DOC_BOILER paragraph (exact repeated spans +
        duplicate paragraphs + the skewed-shingle stress the banding layer
        must survive: one band key covering ~0.3·n docs);
      - token distribution is Zipf-ish (idx = ⌊V·u^2.5⌋) so shingle
        frequencies are heavy-tailed like a real crawl, not uniform.
    """
    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    e = F.col("doc_id")
    is_dup = _pm("dup", 5, e) == 4
    cid = F.when(is_dup, F.greatest(e - 1 - _pm("dupoff", 3, e), F.lit(0))).otherwise(e)
    paras = [
        F.when(_pm("bp", 100, cid) < 30, F.lit(DOC_BOILER)).otherwise(_doc_para(cid, 0)),
        _doc_para(cid, 1),
        F.when(_pm("np", 2, cid) == 1, _doc_para(cid, 2)).otherwise(F.lit(None)),
        F.when(is_dup, F.concat(F.lit("mut m"), _pm("mut", 7, e))).otherwise(
            F.lit(None)
        ),
    ]
    text = F.concat_ws("\n\n", *[p for p in paras])
    lang = F.element_at(
        F.array(*[F.lit(x) for x in ["en", "de", "fr", "es"]]),
        (_pm("dlang", 4, cid) + 1).cast("int"),
    )
    source = F.element_at(
        F.array(*[F.lit(x) for x in ["web", "books", "wiki"]]),
        (_pm("dsrc", 3, e) + 1).cast("int"),
    )
    return df.select(
        e,
        text.alias("text"),
        lang.alias("lang"),
        source.alias("source"),
        F.length(text).alias("n_chars"),
    )


def write_event_log(
    df: DataFrame,
    path: str,
    *,
    n_files: int = 16,
) -> None:
    """Write the log as a directory of parquet files, range-partitioned by
    event_sequence so the streaming file source's per-trigger batches cut
    roughly along sequence order (like a real binlog segment directory).
    """
    df.repartitionByRange(n_files, "event_sequence").write.mode("overwrite").parquet(path)


def golden_final_state_sql(
    events_relation: str,
    known_langs: tuple[str, ...] = tuple(LANGS),
    select_expr: str = "repo, path, commit, lang, sha256(content) AS content_sha",
) -> str:
    """Engine-independent golden oracle (FIXTURES.md §3) as ANSI SQL that both
    DuckDB and Spark can run: replay the log with (a) exact-redelivery dedup on
    (key, event_sequence), (b) quarantine of invalid rows, (c) last-writer-wins
    per (repo, path, commit) by (event_sequence, op) and deletes applied.
    The analog of the reference's CKAN server applying ``datastore_upsert``
    (``pipeline/loaders.py::CKANLoader.upsert`` server-side semantics).

    NOTE: ``sha256`` is the DuckDB spelling; Spark tests use the same text via
    a tiny rewrite (sha256(x) → sha2(x, 256)).
    """
    langs = ", ".join(f"'{x}'" for x in known_langs)
    return f"""
WITH dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY repo, path, commit, event_sequence ORDER BY op) AS rn
    FROM {events_relation}) t WHERE rn = 1
), coerced AS (
  SELECT event_sequence, op, repo, path, commit, trim(lang) AS lang, content
  FROM dedup
), valid AS (
  SELECT * FROM coerced
  WHERE NOT (op <> 'D' AND (content IS NULL OR lang NOT IN ({langs})))
), latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY repo, path, commit
        ORDER BY event_sequence DESC, op DESC) AS rn
    FROM valid) t WHERE rn = 1
)
SELECT {select_expr}
FROM latest WHERE op <> 'D'
""".strip()
