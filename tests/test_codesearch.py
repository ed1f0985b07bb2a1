"""TrigramIndex — incrementally-maintained trigram substring-search index
(operators/codesearch.py): bootstrap/incremental/repair sync from the
source changelog, AND-of-posting-lists candidates, contains() verification,
bucket pruning on both the index probe and the source verify, exactly-once
per source version.

Reference analog: CKAN's datastore_search over upserted resources
(SURVEY A21's consumer surface) — here as a Zoekt-style trigram index kept
in sync by the engine's own changelog."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.operators.codesearch import TrigramIndex, trigram_array
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from test_lake_merge import SCHEMA, ev

# content chosen so trigram sets interact: 'alphabet soup' contains the
# literal 'alpha'; the d4 doc contains every trigram of 'abcxyz' but NOT
# the substring itself (the classic trigram false positive)
DOCS = [
    (1, "I", "r1", "a.py", "c1", "py", "alpha beta"),
    (2, "I", "r1", "b.py", "c1", "py", "beta gamma"),
    (3, "I", "r2", "c.go", "c1", "go", "alphabet soup"),
    (4, "I", "r2", "d.go", "c1", "go", "xabc bcx cxy xyzq"),
]


def _src(spark, tmp, *, retain_history=8):
    t = ParquetSnapshotTable(
        spark, str(tmp / "src"), n_buckets=4, retain_history=retain_history
    )
    t.ensure(SCHEMA)
    return t


def _index(spark, tmp, src, **kw):
    kw.setdefault("n_buckets", 8)
    return TrigramIndex(spark, str(tmp / "idx"), src, **kw)


def _keys(df):
    return {(r["repo"], r["path"], r["commit"]) for r in df.collect()}


def _postings(idx):
    return sorted(
        (r["gram"], r["repo"], r["path"], r["commit"], r["lang"])
        for r in idx.table.read().collect()
    )


def test_trigram_array_edges(spark):
    df = spark.createDataFrame(
        [("abcd",), ("ab",), ("",), (None,), ("aaaa",)], "s string"
    )
    got = [r["g"] for r in df.select(trigram_array(F.col("s")).alias("g")).collect()]
    assert got[0] == ["abc", "bcd"]
    assert got[1] == [] and got[2] == [] and got[3] == []
    assert got[4] == ["aaa"]  # distinct


def test_bootstrap_grep_matches_bruteforce(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    rep = idx.sync()
    assert rep["mode"] == "bootstrap" and rep["applied"]
    for lit in ("alpha", "beta", "soup", "alphabet"):
        got = _keys(idx.grep(lit))
        want = _keys(src.read().where(F.col("content").contains(lit)))
        assert got == want, lit
    assert _keys(idx.grep("alpha")) == {("r1", "a.py", "c1"), ("r2", "c.go", "c1")}
    assert _keys(idx.grep("nosuchliteral")) == set()


def test_false_positive_dies_at_verification(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    # d4 holds every trigram of 'abcxyz' without the substring
    assert ("r2", "d.go", "c1") in _keys(idx.candidates("abcxyz"))
    assert _keys(idx.grep("abcxyz")) == set()


def test_lang_filter_applies_at_index(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    assert _keys(idx.grep("alpha", lang="py")) == {("r1", "a.py", "c1")}
    assert _keys(idx.grep("alpha", lang="go")) == {("r2", "c.go", "c1")}


def test_short_literal_raises(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    with pytest.raises(ValueError, match="shorter than"):
        idx.grep("ab")


def test_incremental_update_delete_and_split_invariance(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    # update doc1 (alpha->omega), delete doc2, insert doc5
    src.merge(
        ev(
            spark,
            [
                (10, "U", "r1", "a.py", "c1", "py", "omega beta"),
                (11, "D", "r1", "b.py", "c1", None, None),
                (12, "I", "r3", "e.py", "c1", "py", "fresh alpha"),
            ],
        ),
        job="j",
        batch_id=1,
    )
    rep = idx.sync()
    assert rep["mode"] == "incremental" and rep["applied"]
    assert rep["rows_deleted"] > 0  # stale grams tombstoned
    assert _keys(idx.grep("alpha")) == {("r2", "c.go", "c1"), ("r3", "e.py", "c1")}
    assert _keys(idx.grep("omega")) == {("r1", "a.py", "c1")}
    assert _keys(idx.grep("gamma")) == set()  # deleted doc gone
    # split invariance: bootstrap-at-final equals bootstrap+incremental
    fresh = TrigramIndex(spark, str(tmp_path / "idx2"), src, n_buckets=8)
    fresh.sync()
    assert _postings(idx) == _postings(fresh)


def test_sync_noop_and_new_instance_cursor(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    v = idx.sync()["to_version"]
    assert idx.sync()["mode"] == "noop"
    # a fresh instance reads the cursor from the index manifest (no side
    # files) and a redelivered sync is a no-op there too
    again = TrigramIndex(spark, str(tmp_path / "idx"), src, n_buckets=8)
    assert again.cursor() == v
    assert again.sync(to_version=v)["mode"] == "noop"


def test_repair_after_retention_expiry(spark, tmp_path):
    src = _src(spark, tmp_path, retain_history=0)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    # two more source versions; retention 0 GC'd the cursor version's dirs
    src.merge(
        ev(spark, [(10, "U", "r1", "a.py", "c1", "py", "omega beta")]),
        job="j", batch_id=1,
    )
    src.merge(
        ev(spark, [(11, "D", "r1", "b.py", "c1", None, None)]),
        job="j", batch_id=2,
    )
    rep = idx.sync()
    # COW dir-sharing may keep the cursor version readable (incremental) or
    # not (repair) — either way postings must land on the from-scratch state
    assert rep["mode"] in ("incremental", "repair") and rep["applied"]
    fresh = TrigramIndex(spark, str(tmp_path / "idx2"), src, n_buckets=8)
    fresh.sync()
    assert _postings(idx) == _postings(fresh)
    assert _keys(idx.grep("omega")) == {("r1", "a.py", "c1")}


def test_repair_mode_when_history_snapshot_missing(spark, tmp_path):
    import glob
    import os

    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    src.merge(
        ev(spark, [(10, "U", "r1", "a.py", "c1", "py", "omega beta")]),
        job="j", batch_id=1,
    )
    # delete the cursor version's history manifest → changes_between raises
    for p in glob.glob(os.path.join(src.root, "history", "manifest.v*.json")):
        if not p.endswith(f"v{src.current_version()}.json"):
            os.remove(p)
    rep = idx.sync()
    assert rep["mode"] == "repair" and rep["applied"]
    fresh = TrigramIndex(spark, str(tmp_path / "idx2"), src, n_buckets=8)
    fresh.sync()
    assert _postings(idx) == _postings(fresh)


def test_grep_prunes_index_and_source_buckets(spark, tmp_path):
    """A query must read only the literal's gram buckets of the index and
    only the candidates' key buckets of the source."""
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src, n_buckets=8)
    idx.sync()
    seen = {}
    for name, tbl in (("idx", idx.table), ("src", src)):
        orig = tbl.read_pruned

        def spy(buckets, version=None, _orig=orig, _name=name):
            seen[_name] = sorted(buckets)
            return _orig(buckets, version=version)

        tbl.read_pruned = spy
    got = _keys(idx.grep("soup"))  # 2 grams -> at most 2 index buckets
    assert got == {("r2", "c.go", "c1")}
    assert 0 < len(seen["idx"]) <= 2 < 8
    assert 0 < len(seen["src"]) <= 1  # one candidate doc -> one source bucket


def test_index_rides_batch_replay_and_stream(spark, tmp_path):
    """An index attached via IngestJob.search_index stays exactly-once
    consistent with the table across chunked batch replay AND a streaming
    drain from checkpoint, including a full redelivery (guard-skipped
    batches sync to no-ops). Final postings equal a from-scratch bootstrap."""
    from wprdc_etl_spark.streaming.job import IngestJob
    from wprdc_etl_spark.testgen import gen_change_events, write_event_log

    src = str(tmp_path / "log")
    write_event_log(gen_change_events(spark, 800), src, n_files=8)
    t = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl"), n_buckets=4, retain_history=8
    )
    idx = TrigramIndex(spark, str(tmp_path / "idx"), t, n_buckets=8)
    job = (
        IngestJob("cs-batch")
        .source(src)
        .schema(IngestJob.default_payload_schema())
        .sink(t)
        .search_index(idx)
        .build()
    )
    job.run_batch(spark, n_chunks=3)
    assert idx.cursor() == t.current_version()
    fresh = TrigramIndex(spark, str(tmp_path / "idx_f"), t, n_buckets=8)
    fresh.sync()
    assert _postings(idx) == _postings(fresh)
    # streaming drain into a second table/index pair
    t2 = ParquetSnapshotTable(
        spark, str(tmp_path / "tbl2"), n_buckets=4, retain_history=8
    )
    idx2 = TrigramIndex(spark, str(tmp_path / "idx2"), t2, n_buckets=8)
    sjob = (
        IngestJob("cs-stream", max_files_per_trigger=3)
        .source(src)
        .schema(IngestJob.default_payload_schema())
        .sink(t2)
        .search_index(idx2)
        .build()
    )
    ckpt = str(tmp_path / "ckpt")
    sjob.start_stream(spark, ckpt).awaitTermination()
    assert idx2.cursor() == t2.current_version()
    assert _postings(idx2) == _postings(fresh)
    ver = t2.current_version()
    # redeliver the drained stream: table and index both stay put
    sjob.start_stream(spark, ckpt).awaitTermination()
    assert t2.current_version() == ver and idx2.cursor() == ver


def test_required_literals_conservative():
    """Cox-style literal extraction: everything returned must occur in
    EVERY match of the pattern (necessity); doubt drops the literal."""
    from wprdc_etl_spark.operators.codesearch import required_literals as rl

    assert rl("a1b2c3") == ["a1b2c3"]
    assert rl("foo.*bar") == ["foo", "bar"]
    assert rl("foo?bar") == ["bar"]          # 'o?' voids the prefix run
    assert rl("foo+bar") == ["foo", "bar"]   # one-or-more keeps the char
    assert rl("foo|bar") == []               # either branch may match
    assert rl("a(bcd)e") == ["bcd"]
    assert rl("a(bcd)?e") == []              # optional group contributes nothing
    assert rl("(abc)+x") == ["abc"]          # required group, repetition ok
    assert rl("a(b|c)defg") == ["defg"]      # inner alternation voided locally
    assert rl("[abc]xyz") == ["xyz"]
    assert rl("[^]x]yzw") == ["yzw"]         # ']' first in negated class
    assert rl(r"foo\.bar") == ["foo.bar"]    # escaped metachar is literal
    assert rl(r"\dabc") == ["abc"]
    assert rl("abc{2}d") == []               # '{' conservatively voids runs
    assert rl("^abc$") == ["abc"]
    assert rl("c0d[e0-9]") == ["c0d"]
    assert rl("a1b.*a1b") == ["a1b"]         # deduplicated
    # '(?' special groups: '(?:' is semantics-preserving; everything else
    # ((?i) flags, lookaround, named groups) voids ALL requirements —
    # e.g. (?i) would invalidate every case-sensitive literal
    assert rl("(?:foo)bar") == ["foo", "bar"]
    assert rl("(?:foo)?bar") == ["bar"]
    assert rl("(?i)needle") == []
    assert rl("(?!foo)barbaz") == []
    assert rl("(?=foo)barbaz") == []
    assert rl("a(?P<g>bcd)e") == []


def test_grep_regex_matches_rlike_bruteforce(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    idx.sync()
    for pat in ("alpha.*(bet|soup)", "beta gamm[ab]", r"alpha\w+soup", "xabc.+xyzq"):
        got = _keys(idx.grep_regex(pat))
        want = _keys(src.read().where(F.col("content").rlike(pat)))
        assert got == want, pat
    with pytest.raises(ValueError, match="cannot bound"):
        idx.grep_regex("alpha|beta")
    with pytest.raises(ValueError, match="cannot bound"):
        idx.grep_regex("a.b.c")


def test_grep_before_sync_raises(spark, tmp_path):
    src = _src(spark, tmp_path)
    src.merge(ev(spark, DOCS), job="j", batch_id=0)
    idx = _index(spark, tmp_path, src)
    with pytest.raises(SinkCommitError, match="never been synced"):
        idx.grep("alpha")
