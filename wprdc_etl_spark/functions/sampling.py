"""Deterministic hash-based sampling and dataset splitting for training data.

Training-corpus pipelines need samples and train/valid/test splits that are

- **reproducible** — rerunning over the same 100 TB yields the same rows,
  regardless of partitioning, cluster size, or execution order (so a random()
  call per row is out: Spark's sample() re-draws under retries/replans);
- **leakage-safe** — all rows sharing a *group key* (a repo, a domain, a
  near-dup cluster id) land on the same side of a split, or the held-out set
  is contaminated by near-copies of training docs;
- **scan-only** — a pure per-row predicate/projection: no shuffle, no state,
  filter evaluated inside whole-stage codegen next to the parquet scan.

All three come from one idea: hash the group key to a uniform 60-bit value,
take it mod a fixed scale, and compare against fraction thresholds. The hash
is the unit of randomness, so membership is a deterministic property of the
KEY — stable across runs, machines, and engine versions.

Leaf hashes (same pluggable-leaf pattern as functions/dedup.py):

- ``xxhash64`` (default): JVM xxhash64 — the production path.
- ``sha2``: first 15 hex chars of sha256 over a '\\x1f'-joined key — slower,
  but bit-identical in DuckDB (``CAST('0x'||substr(sha256(k),1,15) AS
  BIGINT)``), which is what makes the driver oracles exact.

No reference analog (``pipeline/`` has no sampling); this is the
training-data surface the 100-TB brief adds on top of wprdc-etl parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # fraction resolution: 1e-6

_SEP = "\x1f"  # unit separator — unambiguous multi-column key join


def _key_slot(key_cols: list[str], seed: int, hash_fn: str) -> Column:
    """Uniform slot in [0, SCALE) as a pure function of the key columns."""
    cols = [F.col(c) for c in key_cols]
    if hash_fn == "xxhash64":
        h = F.xxhash64(*cols, F.lit(seed))
    elif hash_fn == "sha2":
        joined = F.concat_ws(_SEP, *[c.cast("string") for c in cols], F.lit(str(seed)))
        h = F.conv(F.substring(F.sha2(joined, 256), 1, 15), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (expected 'xxhash64' or 'sha2')")
    return F.pmod(h, F.lit(SCALE))


def slot_sql(key_exprs: list[str], seed: int) -> str:
    """DuckDB twin of ``_key_slot(..., hash_fn='sha2')`` (pmod == % here:
    the parsed 60-bit value is non-negative)."""
    joined = " , ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    return (
        f"(CAST(('0x' || substr(sha256(concat_ws(chr(31), {joined}, '{seed}')), 1, 15)) "
        f"AS BIGINT) % {SCALE})"
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: list[str],
    *,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of key groups (scan-only filter).

    Sampling is BY KEY GROUP: every row whose ``key_cols`` hash to a kept
    slot survives, so sampling on ``["repo"]`` keeps whole repos — the
    leakage-safe unit — while ``["doc_id"]`` is plain per-row Bernoulli.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    k = int(round(fraction * SCALE))
    return df.where(_key_slot(key_cols, seed, hash_fn) < F.lit(k))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_cols: list[str],
    *,
    default_fraction: float = 0.0,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling — e.g. keep 100% of low-resource
    languages and 5% of English. ``fractions`` maps stratum value →
    fraction; unlisted strata get ``default_fraction``. One CASE expression
    per row (codegen'd), no shuffle, no per-stratum jobs."""
    thr: Column = F.lit(int(round(default_fraction * SCALE)))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0,1], got {frac}")
        thr = F.when(F.col(strata_col) == value, F.lit(int(round(frac * SCALE)))).otherwise(thr)
    return df.where(_key_slot(key_cols, seed, hash_fn) < thr)


def _round_half_up(x: float) -> int:
    """Half-up rounding (DuckDB/Spark ``round`` semantics for positives) —
    Python's built-in round() is banker's and would disagree on exact .5."""
    import math

    return int(math.floor(x + 0.5))


def mix_fractions(counts: dict[str, int], targets: dict[str, float]) -> tuple[int, dict[str, float]]:
    """Per-stratum keep fractions that land the output on the TARGET MIX.

    ``targets`` maps stratum → desired share of the output. The achievable
    output size is capped by the scarcest stratum relative to its share:
    ``N = floor(min(count_s / share_s))``; each targeted stratum then keeps
    ``min(1, N·share_s / count_s)`` of its rows; unlisted strata keep 0.
    Pure arithmetic (unit-testable; the SQL twin repeats it verbatim in
    one CTE chain so the oracle is independent of this code path).
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    for s, share in targets.items():
        if share <= 0:
            raise ValueError(f"share for {s!r} must be > 0, got {share}")
        if s not in counts or counts[s] == 0:
            raise ValueError(f"stratum {s!r} has no rows — mix unreachable")
    n_out = int(min(counts[s] / share for s, share in targets.items()))
    fracs = {
        s: min(1.0, (n_out * share) / counts[s]) for s, share in targets.items()
    }
    return n_out, fracs


def mix_corpus(
    df: DataFrame,
    targets: dict[str, float],
    strata_col: str,
    key_cols: list[str],
    *,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Rebalance a corpus to target stratum proportions (the pretraining
    data-mixing step: e.g. 50% en / 30% de / 20% fr regardless of the raw
    crawl's skew). One tiny count aggregate decides per-stratum fractions
    driver-side (|strata| rows), then membership is the same scan-only
    hash-slot predicate as stratified_sample — deterministic, group-atomic,
    no second shuffle at any scale."""
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    _, fracs = mix_fractions(counts, targets)
    thr: Column = F.lit(0)
    for s, frac in sorted(fracs.items()):
        thr = F.when(F.col(strata_col) == s, F.lit(_round_half_up(frac * SCALE))).otherwise(thr)
    return df.where(_key_slot(key_cols, seed, hash_fn) < thr)


def mix_sql(
    relation: str,
    targets: dict[str, float],
    strata_col: str,
    key_exprs: list[str],
    select: str = "*",
    seed: int = 42,
) -> str:
    """DuckDB twin of ``mix_corpus(..., hash_fn='sha2')`` — recomputes the
    counts, cap and thresholds itself (same IEEE double ops, same half-up
    rounding), so the oracle shares no intermediate values with the engine."""
    share_case = "CASE " + " ".join(
        f"WHEN s = '{s}' THEN {share!r}" for s, share in targets.items()
    ) + " END"
    slot = slot_sql([f"d.{e}" for e in key_exprs], seed)
    return f"""
WITH c AS (SELECT {strata_col} AS s, count(*) AS n FROM {relation} GROUP BY 1),
tg AS (SELECT s, n, {share_case} AS share FROM c),
cap AS (SELECT CAST(floor(min(n / share)) AS BIGINT) AS n_out FROM tg WHERE share IS NOT NULL),
th AS (SELECT s, CAST(round(least(1.0, (cap.n_out * share) / n) * {SCALE}) AS BIGINT) AS t
       FROM tg, cap WHERE share IS NOT NULL)
SELECT {select} FROM {relation} d JOIN th ON d.{strata_col} = th.s
WHERE {slot} < th.t
""".strip()


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: list[str],
    *,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep each key group with probability = its weight in [0,1] — the
    quality-weighted downsampling step of a pretraining mix (keep
    high-quality docs, thin low-quality ones, deterministically).

    Exact-parity discipline: the weight is quantized to 4 decimals
    (``round(w*10000)`` — matching quality_score's own rounding) before
    becoming a slot threshold, so the Spark and DuckDB twins compare the
    same integers and no float ULP can flip a row across engines. Still a
    scan-only predicate: slot(key) < round(w*1e4)*100.
    """
    thr = F.least(
        F.lit(SCALE).cast("long"),
        (F.round(F.col(weight_col) * 10_000).cast("long") * 100),
    )
    return df.where(_key_slot(key_cols, seed, hash_fn) < thr)


def weighted_sample_sql(weight_expr: str, key_exprs: list[str], seed: int = 42) -> str:
    """DuckDB twin of ``weighted_sample(..., hash_fn='sha2')`` as a WHERE
    predicate string."""
    thr = f"least({SCALE}, CAST(round(({weight_expr}) * 10000) AS BIGINT) * 100)"
    return f"{slot_sql(key_exprs, seed)} < {thr}"


def with_split(
    df: DataFrame,
    key_cols: list[str],
    *,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Assign a deterministic train/valid/test label per KEY GROUP.

    ``weights`` maps label → weight (normalized; default 98/1/1). Labels are
    assigned by cumulative slot ranges in the given dict order, so all rows
    of a group (same ``key_cols``) share one label — the near-dup-leakage
    guard: split on the dedup cluster id or the repo, never the raw doc id,
    and no near-copy straddles train and test."""
    weights = weights or {"train": 0.98, "valid": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    slot = _key_slot(key_cols, seed, hash_fn)
    labels = list(weights.items())
    # cumulative ranges: label i owns [bound_{i-1}, bound_i); build the CASE
    # back-to-front so the SMALLEST bound is tested first (chain evaluates
    # top-down) and the last label absorbs rounding remainder.
    expr: Column = F.lit(labels[-1][0])
    cum = 0.0
    bounds: list[tuple[str, int]] = []
    for name, w in labels[:-1]:
        cum += w / total
        bounds.append((name, int(round(cum * SCALE))))
    for name, bound in reversed(bounds):
        expr = F.when(slot < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def split_sql(
    key_exprs: list[str],
    weights: dict[str, float] | None = None,
    seed: int = 42,
) -> str:
    """DuckDB CASE twin of ``with_split(..., hash_fn='sha2')``."""
    weights = weights or {"train": 0.98, "valid": 0.01, "test": 0.01}
    total = sum(weights.values())
    slot = slot_sql(key_exprs, seed)
    labels = list(weights.items())
    cases = []
    cum = 0.0
    for name, w in labels[:-1]:
        cum += w / total
        cases.append(f"WHEN {slot} < {int(round(cum * SCALE))} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{labels[-1][0]}' END"
