"""Randomized schema-evolution fuzz (round-4 extension of the commit-protocol
fuzz in test_commit_fuzz.py, applied to the B9 surface): seeded random
schedules interleave keyed merges with every evolution verb the engine
supports — additive column adds, batches carrying random column subsets
(null-fill), int→long type widening, metadata-only DROP COLUMN with its
name-resurrection tombstone, and hostile incompatible-type batches that must
fail loudly WITHOUT applying anything.

Invariant asserted after every trial — evolution never loses or invents data:
  1. the final schema is exactly base + adds − drops (tombstoned names never
     resurrect, even when a later batch carries them again);
  2. the published table equals a Python full-image LWW model: for every
     live key, every surviving column reads the winning batch's value when
     that batch carried the column (and it wasn't tombstoned at the time),
     NULL otherwise;
  3. a failed (incompatible) merge applies nothing and does not consume the
     batch guard — the same batch_id retries cleanly with a fixed payload;
  4. widening is one-way: the table type is the widest type any applied
     batch carried, and pre-widening values round-trip unchanged.

Model of the reference contract: wprdc-etl's marshmallow schemas accept new
fields only by redeploying the schema class (SURVEY §3 A16); here evolution
is part of the merge itself, so the fuzz drives the decision matrix that
tests/test_lake_merge.py pins example-by-example.
"""

import random

import pytest
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import ParquetSnapshotTable

from tests.test_lake_merge import EV_SCHEMA, SCHEMA

N_BUCKETS = 4
TRIALS_PER_BLOCK = 6
STEPS_PER_TRIAL = 5

_SPARK_T = {"int": T.IntegerType(), "long": T.LongType(), "str": T.StringType()}


def _evx(spark, rows, extras):
    """Event batch whose schema is EV base + ``extras`` ([(name, typ)]);
    each row is (seq, op, repo, path, commit, lang, content, *extra_vals)."""
    sch = T.StructType(
        list(EV_SCHEMA.fields)
        + [T.StructField(n, _SPARK_T[t]) for n, t in extras]
    )
    return spark.createDataFrame(rows, sch)


class _Model:
    """Driver-side twin of the table: full-image LWW + schema evolution."""

    def __init__(self):
        self.cols = {}      # live extra columns: name -> 'int'|'long'|'str'
        self.dropped = set()
        self.best = {}      # key -> (seq, op, lang, content, {col: val})

    def apply(self, rows, carried):
        for n, t in carried:
            if n in self.dropped:
                continue
            if n not in self.cols:
                self.cols[n] = t
            elif self.cols[n] == "int" and t == "long":
                self.cols[n] = "long"  # widening is one-way
        for row in rows:
            seq, op, r, p, c, lang, content = row[:7]
            image = {
                n: v for (n, _), v in zip(carried, row[7:])
                if n not in self.dropped
            }
            k = (r, p, c)
            if k not in self.best or seq > self.best[k][0]:
                self.best[k] = (seq, op, lang, content, image)

    def drop(self, name):
        del self.cols[name]
        self.dropped.add(name)

    def final(self):
        out = {}
        for k, (seq, op, lang, content, image) in self.best.items():
            if op == "D":
                continue
            row = {"lang": lang, "content": content}
            for n in self.cols:
                row[n] = image.get(n)
            out[k] = row
        return out


def _gen_rows(rng, seq, keys, extras):
    rows = []
    for _ in range(rng.randint(1, 3)):
        r, p, c = rng.choice(keys)
        op = rng.choices(["I", "U", "D"], weights=[5, 3, 1])[0]
        vals = []
        for n, t in extras:
            vals.append(rng.randint(0, 99) if t in ("int", "long")
                        else f"s{seq}")
        rows.append((seq, op, r, p, c, "py", f"v{seq}", *vals))
        seq += 1
    return rows, seq


def _run_trial(spark, root, rng):
    t = ParquetSnapshotTable(spark, root, n_buckets=N_BUCKETS)
    t.ensure(SCHEMA)
    model = _Model()
    keys = [(f"r{i}", f"p{i}", f"c{j}") for i in range(6) for j in range(2)]
    seq, batch_id, n_added = 0, 0, 0

    def commit(rows, carried):
        nonlocal batch_id
        res = t.merge(_evx(spark, rows, carried), job="w", batch_id=batch_id)
        assert res.applied
        model.apply(rows, carried)
        batch_id += 1

    for _ in range(STEPS_PER_TRIAL):
        live = list(model.cols.items())
        choices = ["base", "add", "subset", "hostile"]
        if any(ty == "int" for _, ty in live):
            choices.append("widen")
        if live:
            choices.append("drop")
        if model.dropped:
            choices.append("resurrect")
        mode = rng.choice(choices)

        if mode == "drop":
            victim = rng.choice([n for n, _ in live])
            t.drop_column(victim)
            model.drop(victim)
            continue
        if mode == "hostile":
            # string batch into an int/long column (or fractional-free table:
            # make one on the fly) must raise and apply NOTHING
            target = next((n for n, ty in live if ty in ("int", "long")), None)
            if target is None:
                target = f"x{n_added}"  # unique: never collides with a tombstone
                n_added += 1
                carried = [(target, "int")]
                rows, seq = _gen_rows(rng, seq, keys, carried)
                commit(rows, carried)
                live = list(model.cols.items())
            bad = [(n, "str" if ty != "str" else "int")
                   for n, ty in live if n == target]
            rows, seq = _gen_rows(rng, seq, keys, bad)
            with pytest.raises(SinkCommitError, match="incompatible"):
                t.merge(_evx(spark, rows, bad), job="w", batch_id=batch_id)
            # invariant 3: nothing applied, guard not consumed — the SAME
            # batch_id retries with a corrected payload
            fixed = [(n, model.cols[n]) for n, _ in bad]
            rows2, seq = _gen_rows(rng, seq, keys, fixed)
            commit(rows2, fixed)
            continue

        if mode == "base":
            carried = []
        elif mode == "add":
            carried = [(f"x{n_added}", rng.choice(["int", "str"]))]
            n_added += 1
        elif mode == "subset":
            carried = [nt for nt in live if rng.random() < 0.6]
        elif mode == "widen":
            target = rng.choice([n for n, ty in live if ty == "int"])
            carried = [(target, "long")]
        else:  # resurrect: tombstoned name carried again — silently ignored
            carried = [(rng.choice(sorted(model.dropped)), "str")]
        rows, seq = _gen_rows(rng, seq, keys, carried)
        if mode == "widen":
            rows = [r[:7] + (5_000_000_000 + r[0],) for r in rows]
        commit(rows, carried)

    # ---- invariants -------------------------------------------------------
    fresh = ParquetSnapshotTable(spark, root, n_buckets=N_BUCKETS)
    base = ["repo", "path", "commit", "lang", "content"]
    assert set(fresh.read().columns) == set(base) | set(model.cols)   # (1)
    got_types = {f.name: f.dataType for f in fresh.schema().fields}
    for n, ty in model.cols.items():                                  # (4)
        assert got_types[n] == _SPARK_T[ty], n
    got = {
        (r["repo"], r["path"], r["commit"]):
            {c: r[c] for c in ["lang", "content", *model.cols]}
        for r in fresh.read().collect()
    }
    assert got == model.final()                                       # (2)


@pytest.fixture(scope="module", autouse=True)
def _tiny_shuffle(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("block", range(10))
def test_schema_evolution_fuzz(spark, tmp_path, block):
    """10 blocks x 6 trials = 60 seeded random evolution schedules."""
    for i in range(TRIALS_PER_BLOCK):
        seed = block * TRIALS_PER_BLOCK + i
        rng = random.Random(7_777_779 * (seed + 1))
        _run_trial(spark, str(tmp_path / f"tbl{seed}"), rng)
