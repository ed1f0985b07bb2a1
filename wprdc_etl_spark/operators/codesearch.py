"""Trigram substring-search index over the code lake — incrementally
maintained from the table changelog (CDC out feeding a search sink).

Reference tie-in: wprdc-etl's terminal surface is the CKAN datastore, whose
consumers get full-text search server-side (SURVEY A21 — ``datastore_upsert``
into a datastore resource is immediately datastore_search-able). The lake
analog is missing by default: a parquet snapshot answers keyed lookups and
scans, but "which live files contain this byte string?" is a full-corpus
scan. The classic scale answer for CODE (Google Code Search, Zoekt) is a
positional-free TRIGRAM index: every live document posts its distinct
3-byte substrings; a literal query q is answered by intersecting the
posting lists of q's trigrams (necessary conditions) and verifying the few
candidates against the real content.

``TrigramIndex`` is that structure as a second engine table, kept in sync
the same way ``TableReplicator`` keeps a replica in sync:

- **Posting table**: one row per (gram, repo, path, commit) with the doc's
  ``lang`` as payload (language-filtered search without touching the
  source). Keyed ``(gram, *source keys)``, BUCKETED BY ``gram`` — so a
  query's probe reads only the dirs its trigrams hash to, driver-side
  (``read_pruned``), never the index.
- **Cursor = the index table's own committed batch id** (the source version
  last applied, durable in the index manifest via the B8 guard — no side
  files, redelivered syncs are no-ops).
- **Incremental sync**: ``changes_between(cursor, v)`` names the changed
  keys; old/new postings are recomputed ONLY for those keys (both source
  reads bucket-pruned to the changed keys' buckets) and anti-joined both
  ways, so the merge batch is exactly the posting delta — stale grams of an
  updated/deleted doc tombstone ('D'), new grams upsert ('I'). A cursor
  expired under source retention degrades to a full state-vs-index diff
  (``mode='repair'``) — same shape as the replicator's repair.
- **Query** (``grep``): AND-of-posting-lists on the literal's trigrams
  (posting rows are unique per (gram, key), so the candidate test is
  ``count == n_grams`` after one hash agg), then verification joins the
  small candidate set back against the source state — also bucket-pruned,
  by the candidates' key buckets — and keeps rows whose content really
  contains the literal. False positives (trigrams present, substring not
  contiguous) die here; false negatives are impossible.

Scale shape at 100 TB: postings are ~50-byte rows, |distinct trigrams per
doc| ≈ min(|doc|, 16M) — the index is a bounded-vocabulary table orders of
magnitude narrower than the corpus. A trickle CDC batch syncs O(changed
docs × their grams) rows routed to gram buckets; a query touches
O(|literal| − 2) gram buckets of the index plus the candidate buckets of
the source. Nothing scans the corpus; nothing funnels through the driver
but two ≤ n_buckets bucket-id collects.

Reference parity: none (SURVEY §2 extension) — this is the engine marrying
its own changelog (Iceberg incremental-read analog) to a search sink, the
pattern Debezium → Elasticsearch connectors implement operationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.operators.xxhash import bucket_of_py
from wprdc_etl_spark.plans.lake import LineageCounts, ParquetSnapshotTable, load_manifest_keys


def trigram_array(col, *, n: int = 3):
    """Distinct character n-grams (default 3) of a string column as an
    in-row array — O(length) per row, no shuffle, no Python.

    Construction matters at corpus scale: the obvious
    ``transform(sequence(1, L-2), i -> substr(c, i, 3))`` is O(L²) per row —
    ``UTF8String.substring`` walks bytes from position 0 on EVERY call (it
    must count code points), and an expression referenced inside a
    higher-order-function lambda is re-evaluated per element besides. So:
    split once into a code-point array, then build windows by zipping the
    array against its own shifted slices — every lambda touches only its
    lambda variables (nothing re-evaluates), every step is one linear pass.
    ``zip_with`` null-pads the shorter side, so the ragged tail windows
    come out null/short and one length filter drops them (this also drops
    windows polluted by the trailing '' element Java's split(,-1) emits).
    NULL and shorter-than-n strings yield an empty array."""
    chars = F.split(F.coalesce(col, F.lit("")), "")
    acc = chars
    for k in range(1, n):
        tail_len = F.greatest(F.size(chars) - F.lit(k), F.lit(1))
        acc = F.zip_with(
            acc, F.slice(chars, k + 1, tail_len), lambda a, b: F.concat(a, b)
        )
    return F.array_distinct(F.filter(acc, lambda x: F.length(x) == n))


def required_literals(pattern: str, *, min_len: int = 3) -> list[str]:
    """Literal substrings PROVABLY required by ``pattern`` (the heart of
    Russ Cox's codesearch trigram query planning, conservative subset):
    every returned literal occurs in EVERY string the regex matches, so
    their trigrams bound the candidate set with no false negatives.

    Conservative by construction — whenever a construct could make
    surrounding text optional, the affected characters (or the whole
    enclosed group) are dropped from the requirement set:

    - plain characters extend the current literal run
    - ``\\`` escapes of non-class metachars (``\\.`` etc.) are literal;
      class escapes (``\\d\\w\\s`` …) just break the run
    - ``?`` / ``*`` / ``{`` make the PRECEDING atom optional/repeatable →
      it leaves the run; ``+`` keeps it (one-or-more); a quantified GROUP
      drops the whole group's contribution
    - ``.``, ``[...]`` classes, anchors ``^$`` break the run
    - a ``(...)`` group with no top-level ``|`` contributes its own
      required literals UNLESS quantified; any ``|`` at a given nesting
      level voids every requirement at that level (either branch may match)

    Returns maximal runs of length ≥ ``min_len``, deduplicated, order
    preserved. An unsupported/unbalanced pattern yields ``[]`` (callers
    must treat that as "cannot bound — full scan or error")."""

    def parse(i: int) -> tuple[list[str], int, bool]:
        # returns (required literals inside this group, index past it,
        # saw_top_level_alternation)
        lits: list[str] = []
        run: list[str] = []
        alt = False

        def flush():
            if len(run) >= min_len:
                lits.append("".join(run))
            run.clear()

        while i < len(pattern):
            ch = pattern[i]
            nxt = pattern[i + 1] if i + 1 < len(pattern) else ""
            if ch == ")":
                flush()
                return lits, i + 1, alt
            if ch == "|":
                alt = True
                run.clear()
                lits.clear()  # nothing before/after | is required
                i += 1
                continue
            if ch == "(":
                flush()
                body = i + 1
                if nxt == "?":
                    # '(?:' is semantics-preserving — parse past the prefix;
                    # every other '(?...' construct (inline flags (?i),
                    # lookaround (?=/(?!/(?<, named groups, ...) can change
                    # what the WHOLE pattern matches — e.g. (?i) voids every
                    # case-sensitive literal — so the only safe answer is no
                    # requirements at all
                    if i + 2 < len(pattern) and pattern[i + 2] == ":":
                        body = i + 3
                    else:
                        return [], len(pattern), alt
                sub, j, sub_alt = parse(body)
                quant = j < len(pattern) and pattern[j] in "?*{"
                if not sub_alt and not quant:
                    lits.extend(sub)
                i = j + (1 if quant and pattern[j] != "{" else 0)
                if quant and pattern[j] == "{":
                    i = pattern.find("}", j)
                    if i == -1:
                        return [], len(pattern), alt
                    i += 1
                continue
            if ch == "\\":
                if nxt and nxt in r".^$*+?()[]{}|\/":
                    run.append(nxt)  # escaped metachar is a literal char
                else:
                    flush()  # \d \w \b … — a class/anchor, breaks the run
                i += 2
                continue
            if ch == "[":
                flush()
                # ']' immediately after '[' (or '[^') is a literal member;
                # walk escape-aware so an escaped \] never ends the class
                # early (which would leak class members as "required")
                j = i + 2 + (1 if nxt == "^" else 0)
                while j < len(pattern) and pattern[j] != "]":
                    j += 2 if pattern[j] == "\\" else 1
                if j >= len(pattern):
                    return [], len(pattern), alt
                i = j + 1
                continue
            if ch in "?*":
                if run:
                    run.pop()  # preceding char now optional/repeatable-from-0
                flush()
                i += 1
                continue
            if ch == "{":
                if run:
                    run.pop()  # could be {0,n}; conservative
                flush()
                j = pattern.find("}", i)
                if j == -1:
                    return [], len(pattern), alt
                i = j + 1
                continue
            if ch == "+":
                # one-or-more: the char itself stays required, but the run
                # cannot extend PAST it contiguously (aa+b matches "aab")
                flush()
                i += 1
                continue
            if ch in ".^$":
                flush()
                i += 1
                continue
            run.append(ch)
            i += 1
        flush()
        return lits, i, alt

    lits, _, alt = parse(0)
    if alt:
        return []
    out: list[str] = []
    for l in lits:
        if l not in out:
            out.append(l)
    return out


class TrigramIndex:
    """Persistent trigram posting table over a ``ParquetSnapshotTable``
    of documents, synced from its changelog.

    ``payload_cols`` ride each posting (default ``['lang']`` when the
    source has it) for filter-at-the-index queries; anything else about a
    match comes from the verification join against the source itself.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: ParquetSnapshotTable,
        *,
        content_col: str = "content",
        payload_cols: list[str] | None = None,
        job: str = "trigram-index",
        n_buckets: int = 16,
        gram_n: int = 3,
        retain_history: int = 1,
        write_mode: str = "mor",
    ) -> None:
        self.spark = spark
        self.source = source
        self.content_col = content_col
        self.job = job
        self.gram_n = int(gram_n)
        # restore the source's authoritative keys before deriving the
        # posting layout from them (see lake.load_manifest_keys)
        load_manifest_keys(source)
        self._payload = payload_cols  # resolved lazily against the source schema
        # write_mode defaults to merge-on-read: gram hashes spread a sync's
        # delta uniformly over EVERY bucket, so copy-on-write would rewrite
        # the whole index for a 1% source batch (measured 66 s vs MOR's
        # append at sf0.1, 38M postings); inline compaction still bounds
        # each bucket's delta chain
        self.table = ParquetSnapshotTable(
            spark,
            root,
            keys=["gram", *source.keys],
            bucket_keys=["gram"],
            n_buckets=n_buckets,
            retain_history=retain_history,
            write_mode=write_mode,
        )

    # ---- posting generation ---------------------------------------------------

    def _payload_cols(self, state: DataFrame) -> list[str]:
        if self._payload is not None:
            return [c for c in self._payload if c in state.columns]
        return ["lang"] if "lang" in state.columns else []

    def _postings(self, state: DataFrame) -> DataFrame:
        """(gram, *keys, *payload) — one explode of the in-row distinct-gram
        array; posting rows are unique per (gram, key) by construction."""
        pay = self._payload_cols(state)
        return state.select(
            F.explode(trigram_array(F.col(self.content_col), n=self.gram_n)).alias(
                "gram"
            ),
            *self.source.keys,
            *pay,
        )

    @property
    def _pk(self) -> list[str]:
        return ["gram", *self.source.keys]

    # ---- sync (CDC in) ----------------------------------------------------------

    def cursor(self) -> int | None:
        """Last source version applied (None before the first sync) — read
        from the index table's own manifest, never a side file."""
        if not self.table.exists():
            return None
        return self.table.last_committed_batch(self.job)

    def _delta(self, new_p: DataFrame, old_p: DataFrame) -> DataFrame:
        """Posting delta as a merge batch: rows whose full (pk, payload)
        image is absent from the old postings → 'I' — this covers both
        brand-new postings AND payload-only refreshes (e.g. a doc's ``lang``
        changes while its content doesn't: the pk survives, so the upsert
        replaces the stale payload in place; diffing on pk alone would leave
        it stale forever and payload-filtered grep would silently miss the
        doc). pk-only-in-old → 'D' (null payload — the merge tombstone
        contract). Unchanged postings never enter the batch, so untouched
        gram buckets are not rewritten."""
        pay = [c for c in new_p.columns if c not in self._pk]
        old_img = old_p
        for c in pay:  # payload col newly added to the source mid-stream
            if c not in old_img.columns:
                old_img = old_img.withColumn(
                    c, F.lit(None).cast(new_p.schema[c].dataType)
                )
        n, o = new_p.alias("n"), old_img.select(*self._pk, *pay).alias("o")
        cond = F.lit(True)
        for c in self._pk:
            cond = cond & (F.col(f"n.{c}") == F.col(f"o.{c}"))
        for c in pay:  # null-safe: a null payload value is an image, not a wildcard
            cond = cond & F.col(f"n.{c}").eqNullSafe(F.col(f"o.{c}"))
        adds = n.join(o, cond, "left_anti").withColumn("op", F.lit("I"))
        dels = (
            old_p.select(self._pk)
            .join(new_p.select(self._pk), self._pk, "left_anti")
            .select(
                *self._pk,
                *[
                    F.lit(None).cast(new_p.schema[c].dataType).alias(c)
                    for c in pay
                ],
                F.lit("D").alias("op"),
            )
        )
        return adds.unionByName(dels)

    def sync(self, to_version: int | None = None) -> dict:
        """Advance the index to the source's ``to_version`` (default: its
        current published version). Returns a report dict: ``mode`` is
        'noop' | 'bootstrap' | 'incremental' | 'repair'. Exactly-once per
        source version via the index table's own batch guard."""
        src_v = self.source.published_version()
        if src_v is None:
            raise SinkCommitError(
                f"source table at {self.source.root} does not exist"
            )
        to_v = src_v if to_version is None else to_version
        last = self.cursor()
        if last is not None and to_v <= last:
            return {"mode": "noop", "applied": False, "cursor": last,
                    "to_version": to_v}

        pinned: list[DataFrame] = []
        if last is None:
            batch = self._postings(self.source.read(version=to_v)).withColumn(
                "op", F.lit("I")
            )
            mode = "bootstrap"
        else:
            try:
                # persist the NARROW diff: without it the full-outer
                # changelog join re-executes for every consumer below (two
                # bucket-id collects, both posting builds, both anti-join
                # sides, every merge action) — measured ~6 evaluations per
                # sync. The posting sets persist too: each feeds both
                # anti-joins and then the merge.
                changed = (
                    self.source.changes_between(last, to_v)
                    .select(*self.source.keys, "change_op")
                    .persist()
                )
                pinned.append(changed)
                mode = "incremental"
                new_keys = changed.where(F.col("change_op") != "D").select(
                    *self.source.keys
                )
                old_keys = changed.where(F.col("change_op") != "I").select(
                    *self.source.keys
                )
                new_p = self._postings(
                    self.source.read_pruned_for_keys(new_keys, version=to_v).join(
                        F.broadcast(new_keys), self.source.keys
                    )
                ).persist()
                old_p = self._postings(
                    self.source.read_pruned_for_keys(old_keys, version=last).join(
                        F.broadcast(old_keys), self.source.keys
                    )
                ).persist()
                pinned += [new_p, old_p]
                batch = self._delta(new_p, old_p)
            except SinkCommitError:
                # cursor expired under source retention: diff the full
                # recomputed posting set against the live index — O(corpus
                # grams + index), still an exact net delta (also repairs any
                # divergence), for this one sync only.
                mode = "repair"
                new_p = self._postings(self.source.read(version=to_v)).persist()
                pinned.append(new_p)
                batch = self._delta(new_p, self.table.read())

        try:
            self.table.ensure(batch.drop("op").schema)
            batch = batch.withColumn("event_sequence", F.lit(to_v).cast("long"))
            res = self.table.merge(
                batch,
                job=self.job,
                batch_id=to_v,
                counts=LineageCounts(extra={"mode": mode, "source_version": to_v}),
            )
        finally:
            for df in pinned:
                df.unpersist()
        return {
            "mode": mode,
            "applied": res.applied,
            "cursor": to_v if res.applied else last,
            "to_version": to_v,
            "index_version": res.version,
            "rows_upserted": res.rows_upserted,
            "rows_deleted": res.rows_deleted,
        }

    # ---- query ----------------------------------------------------------------

    def grams_of(self, literal: str) -> list[str]:
        n = self.gram_n
        if len(literal) < n:
            raise ValueError(
                f"literal {literal!r} shorter than the index gram size {n} — "
                f"a {n}-gram index cannot bound this query; scan the source"
            )
        return sorted({literal[i: i + n] for i in range(len(literal) - n + 1)})

    def candidates(self, literal: str, **filters) -> DataFrame:
        """Keys of documents whose posting lists contain EVERY trigram of
        ``literal`` (necessary, not sufficient) — the AND-of-posting-lists
        step, bucket-pruned to the literal's gram buckets."""
        return self._candidates_for_grams(self.grams_of(literal), filters)

    def _query_snapshot(self) -> tuple[dict, int]:
        """ONE manifest read pinning a consistent (index version, source
        cursor) pair for a whole query — a sync committing mid-query can
        then neither surface unindexed matches nor verify stale grams
        against newer bytes (both reads below pass explicit versions)."""
        if not self.table.exists():
            raise SinkCommitError("index has never been synced — nothing to query")
        man = self.table._require_manifest()
        at = man.get("committed", {}).get(self.job)
        if at is None:
            raise SinkCommitError("index has never been synced — nothing to query")
        return man, int(at)

    def _candidates_for_grams(
        self, grams: list[str], filters: dict, man: dict | None = None
    ) -> DataFrame:
        if man is None:
            man = self.table._require_manifest()
        import pyspark.sql.types as T

        posting_cols = set(T.StructType.fromJson(man["schema"]).fieldNames())
        missing = [c for c in filters if c not in posting_cols]
        if missing:
            raise ValueError(
                f"filter column(s) {missing} do not ride the postings "
                f"(available: {sorted(posting_cols)}) — pass payload_cols= "
                f"at index build time or filter the grep result instead"
            )
        buckets = sorted(
            {
                bucket_of_py(man["n_buckets"], g, types=["string"])
                for g in grams
            }
        )
        idx = self.table.read_pruned(buckets, version=man["version"]).where(
            F.col("gram").isin(grams)
        )
        for col, val in filters.items():
            idx = idx.where(F.col(col) == val)
        # posting rows are unique per (gram, key): count == n_grams ⇔ all
        # grams present — one narrow hash agg, map-side combined
        return (
            idx.groupBy(*self.source.keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") == len(grams))
            .drop("_n")
        )

    def grep(self, literal: str, **filters) -> DataFrame:
        """Live source rows whose content contains ``literal`` — candidates
        from the index, verified against the (candidate-bucket-pruned)
        source state AT THE CURSOR VERSION, so results are exactly
        consistent with what the index has seen (a source commit racing the
        query can neither surface unindexed matches nor verify old grams
        against newer bytes). ``filters`` (e.g. ``lang='py'``) are applied
        at the INDEX when the column rides the postings — a filtered query
        never widens the candidate set."""
        man, at = self._query_snapshot()
        cand = self._candidates_for_grams(self.grams_of(literal), filters, man=man)
        state = self.source.read_pruned_for_keys(cand, version=at)
        return state.join(F.broadcast(cand), list(self.source.keys)).where(
            F.col(self.content_col).contains(literal)
        )

    def grep_regex(self, pattern: str, **filters) -> DataFrame:
        """Regex search bounded by trigram query planning (Cox codesearch):
        candidates must hold every trigram of every PROVABLY-REQUIRED
        literal of ``pattern`` (``required_literals`` — conservative, so
        false negatives are impossible); the full regex then verifies via
        ``rlike`` on the pruned source state. A pattern with no required
        literal of gram size (top-level alternation, pure wildcards) cannot
        be index-bounded — raises; scan the source directly for those. Use
        the RE2∩Java syntax subset when an external engine must agree on
        the match set."""
        lits = [
            l
            for l in required_literals(pattern, min_len=self.gram_n)
            if len(l) >= self.gram_n
        ]
        if not lits:
            raise ValueError(
                f"pattern {pattern!r} has no required literal of length >= "
                f"{self.gram_n} — the trigram index cannot bound it; scan "
                f"the source with rlike directly"
            )
        man, at = self._query_snapshot()
        grams = sorted({g for l in lits for g in self.grams_of(l)})
        cand = self._candidates_for_grams(grams, filters, man=man)
        state = self.source.read_pruned_for_keys(cand, version=at)
        return state.join(F.broadcast(cand), list(self.source.keys)).where(
            F.col(self.content_col).rlike(pattern)
        )
