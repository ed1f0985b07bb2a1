"""Property-based invariants (hypothesis) — beyond the reference's test
strategy (SURVEY §6.1: plain unittest only), these pin the engine's core
algebraic claims:

1. batching-invariance: ANY chunking of an event log converges to the same
   final state as a single-batch apply (LWW is associative, the merge
   composes) — the property behind checkpoint-resume correctness (B13).
2. redelivery-idempotence: duplicating arbitrary events verbatim never
   changes the final state (B3/B8).

Examples are kept small and few — each example spins real Spark jobs.
"""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
from pyspark.sql import types as T

from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

EV_SCHEMA = T.StructType(
    [T.StructField("event_sequence", T.LongType()), T.StructField("op", T.StringType())]
    + [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)

PAYLOAD = T.StructType(
    [T.StructField(c, T.StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
)

# small closed world: 2 repos × 2 paths × 2 commits, ops I/U/D
keys = st.tuples(
    st.sampled_from(["rA", "rB"]), st.sampled_from(["p1", "p2"]), st.sampled_from(["c1", "c2"])
)
events = st.lists(
    st.tuples(keys, st.sampled_from(["I", "U", "D"]), st.text("xyz", min_size=0, max_size=3)),
    min_size=1,
    max_size=10,
)


def to_rows(log):
    return [
        (seq, op, k[0], k[1], k[2], "py", None if op == "D" else content)
        for seq, (k, op, content) in enumerate(log)
    ]


def apply_rows(spark, tmp, rows, cuts):
    t = ParquetSnapshotTable(spark, str(tmp), n_buckets=2)
    t.ensure(PAYLOAD)
    max_seq = max(r[0] for r in rows) + 1
    bounds = [0] + sorted(min(c, max_seq) for c in cuts) + [max_seq]
    for bid, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        batch = [r for r in rows if lo <= r[0] < hi]
        t.merge(spark.createDataFrame(batch, EV_SCHEMA), job="prop", batch_id=bid)
    return {(r["repo"], r["path"], r["commit"]): r["content"] for r in t.read().collect()}


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=events, cut=st.integers(min_value=0, max_value=9))
def test_batching_invariance(spark, tmp_path_factory, log, cut):
    rows = to_rows(log)
    tmp = tmp_path_factory.mktemp("prop")
    assert apply_rows(spark, tmp / "one", rows, cuts=[]) == apply_rows(
        spark, tmp / "two", rows, cuts=[cut]
    )


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=events, dup_idx=st.integers(min_value=0, max_value=9))
def test_redelivery_idempotence(spark, tmp_path_factory, log, dup_idx):
    rows = to_rows(log)
    redelivered = rows + [rows[min(dup_idx, len(rows) - 1)]]  # verbatim copy, same seq
    tmp = tmp_path_factory.mktemp("prop")
    assert apply_rows(spark, tmp / "a", rows, cuts=[]) == apply_rows(
        spark, tmp / "b", redelivered, cuts=[]
    )


# ---- DML interleaving vs a pure-Python LWW reference ----------------------
#
# delete_where/update_where stamp event_sequence = (historical max) + 1 and
# ride the ordinary merge, so ANY interleaving of log chunks and DML verbs
# must equal a reference state machine that models exactly that total order
# (later log events with HIGHER seqs override a DML; stragglers with lower
# seqs lose to it).

dml_ops = st.lists(
    st.one_of(
        st.tuples(st.just("merge"), events),
        st.tuples(st.just("delete"), st.sampled_from(["rA", "rB"])),
        st.tuples(st.just("update"), st.sampled_from(["rA", "rB"])),
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=dml_ops)
def test_dml_interleaving_matches_reference(spark, tmp_path_factory, ops):
    from pyspark.sql import functions as F

    tmp = tmp_path_factory.mktemp("dmlprop")
    t = ParquetSnapshotTable(spark, str(tmp / "t"), n_buckets=2)
    t.ensure(PAYLOAD)

    store = {}  # key -> (seq, op, lang, content); tombstones retained
    max_seq = -1

    def visible():
        return {k: v for k, v in store.items() if v[1] != "D"}

    def lww(k, cand):
        cur = store.get(k)
        if cur is None or (cand[0], cand[1]) >= (cur[0], cur[1]):
            store[k] = cand

    next_seq = 0  # engine log seqs keep increasing across chunks
    mbid = 0
    for kind, arg in ops:
        if kind == "merge":
            rows = []
            for (k, op, content) in arg:
                seq = next_seq
                next_seq += 1
                rows.append((seq, op, k[0], k[1], k[2], "py",
                             None if op == "D" else content))
            t.merge(spark.createDataFrame(rows, EV_SCHEMA), job="prop", batch_id=mbid)
            mbid += 1
            for (seq, op, r, p, c, lang, content) in rows:
                lww((r, p, c), (seq, op, lang, content))
                max_seq = max(max_seq, seq)
        elif kind == "delete":
            t.delete_where(F.col("repo") == arg)
            dseq = max_seq + 1
            for k in list(visible()):
                if k[0] == arg:
                    store[k] = (dseq, "D", None, None)
            max_seq = dseq
            # next_seq deliberately NOT bumped: later generated log events
            # may carry seqs at/below the DML's — the straggler case the
            # tombstone must win (ties resolve by op rank, engine parity)
        else:  # update: retag lang, content untouched
            t.update_where(F.col("repo") == arg, {"lang": F.lit("LL")})
            useq = max_seq + 1
            for k, v in list(visible().items()):
                if k[0] == arg:
                    store[k] = (useq, "U", "LL", v[3])
            max_seq = useq

    got = {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in t.read().collect()
    }
    want = {k: (v[2], v[3]) for k, v in visible().items()}
    assert got == want


# ---- partial-image (patch) merge vs a pure-Python carry-forward reference --
#
# operators/patch.py defines: U-NULL-in-patch-col = unchanged (carry), I =
# full image (resets), D = all-null patch base; normalize∘merge is
# batch-split invariant. The reference below applies events sequentially —
# the property says the distributed normalize+merge under ANY chunking
# equals it exactly.

patch_events = st.lists(
    st.tuples(
        keys,
        st.sampled_from(["I", "U", "D"]),
        st.one_of(st.none(), st.text("xy", min_size=1, max_size=2)),
        st.one_of(st.none(), st.text("mn", min_size=1, max_size=2)),
    ),
    min_size=1,
    max_size=10,
)


def _ref_patch_final(rows):
    img, last_op = {}, {}
    for _seq, op, r, p, c, lang, content in rows:
        k = (r, p, c)
        if op == "I":
            img[k] = (lang, content)
        elif op == "D":
            img[k] = (None, None)
        else:
            cur = img.get(k, (None, None))
            img[k] = (
                lang if lang is not None else cur[0],
                content if content is not None else cur[1],
            )
        last_op[k] = op
    return {k: v for k, v in img.items() if last_op[k] != "D"}


def _apply_patch_rows(spark, tmp, rows, cuts):
    from wprdc_etl_spark.operators.patch import patch_merge

    t = ParquetSnapshotTable(spark, str(tmp), n_buckets=2)
    t.ensure(PAYLOAD)
    max_seq = max(r[0] for r in rows) + 1
    bounds = [0] + sorted(min(c, max_seq) for c in cuts) + [max_seq]
    for bid, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        batch = [r for r in rows if lo <= r[0] < hi]
        if batch:
            patch_merge(
                t, spark.createDataFrame(batch, EV_SCHEMA), job="prop", batch_id=bid + 1
            )
    return {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in t.read().collect()
    }


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(log=patch_events, cut=st.integers(min_value=0, max_value=9))
def test_patch_merge_equals_sequential_carry_forward(
    spark, tmp_path_factory, log, cut
):
    rows = [
        (seq, op, k[0], k[1], k[2], lang, content)
        for seq, (k, op, lang, content) in enumerate(log)
    ]
    tmp = tmp_path_factory.mktemp("patchprop")
    want = _ref_patch_final(rows)
    assert _apply_patch_rows(spark, tmp / "chunked", rows, cuts=[cut]) == want
