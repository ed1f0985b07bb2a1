"""Streaming changelog source — ``spark.readStream`` over a
``ParquetSnapshotTable``'s commit history (the Delta ``readChangeFeed`` /
Iceberg incremental-scan analog, re-expressed as a Spark 4 Python
``DataSource`` streaming reader).

Offsets ARE table versions: each micro-batch covers one committed version
range and emits exactly the NET row changes ``changes_between(start, end)``
would return — so a checkpointed stream is exactly-once per version pair
the same way the batch consumers (replicator, rollup, SCD2, indexes) are
exactly-once per cursor, but event-driven: followers become
``foreachBatch`` consumers of this source instead of polling.

Scale shape (the part that matters at 10^10 rows):

- the DRIVER diffs only MANIFESTS — two JSON reads per micro-batch decide
  which buckets changed between the offsets (bucket dir lists are
  content-addressed by the commit protocol: an untouched bucket keeps the
  identical dir list), so unchanged buckets are pruned before any file IO;
- each changed bucket becomes ONE input partition; EXECUTORS do the heavy
  work — read the bucket's base+delta parquet (column-pruned to
  keys + compare columns + the LWW metadata), resolve last-writer-wins
  per key (the same ``(_seq, _op)`` order the engine defines; vectorized
  in pandas, no per-row Python), and diff the two states;
- payloads never fan out: like ``changes_between``, the emitted rows carry
  only keys + ``change_op`` + the compare columns (``content_sha`` by
  default) — consumers join payloads back by key.

The Python DataSource reader runs WITHOUT a SparkSession (driver side in a
dedicated worker process, executor side in task workers), so manifest and
parquet access here is json/os/pyarrow — mirroring, not calling, the
table's own readers. Equality with ``changes_between`` is pinned by tests
and by the ``cdc_changelog_stream`` driver oracle.

A version range that spans a REBUCKET (bucket layout change) cannot be
bucket-paired; the reader falls back to a single full-diff partition —
correct (and empty for a pure rebucket, which is state-preserving), rare,
and documented. A start offset older than ``retain_history`` raises the
same clean expiration error the batch path gives.
"""

from __future__ import annotations

import json
import math
import os
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


def _load_manifest(root: str) -> dict:
    with open(os.path.join(root, "manifest.json"), "r", encoding="utf-8") as fh:
        return json.load(fh)


def _manifest_at(root: str, version: int) -> dict:
    man = _load_manifest(root)
    if version == man["version"]:
        return man
    if version > man["version"]:
        raise ValueError(
            f"version {version} does not exist at {root} (head is {man['version']})"
        )
    hpath = os.path.join(root, "history", f"manifest.v{version}.json")
    if not os.path.exists(hpath):
        raise ValueError(
            f"version {version} has no history snapshot at {root} — older than "
            f"the table's retain_history window; resume the stream from a "
            f"retained version or raise retention to cover consumer lag"
        )
    with open(hpath, "r", encoding="utf-8") as fh:
        return json.load(fh)


def _published_version(root: str) -> int:
    man = _load_manifest(root)
    pv = man.get("published_version")
    return int(man["version"] if pv is None else pv)


def _compare_cols(man: dict, keys: list[str], opt: str | None) -> list[str]:
    """The stream's compare set, fixed ONCE from the head manifest at
    stream start (a streaming source's schema cannot vary per batch).
    Versions predating an additive evolution null-fill the missing columns
    — semantically exact: the engine's own evolution null-fills old rows,
    so pre-evolution state compares equal and only a real later assignment
    surfaces as 'U'. Default mirrors ``changes_between``: ``content_sha``
    alone when present, else every non-key column."""
    if opt:
        return [c.strip() for c in opt.split(",") if c.strip()]
    fields = [c for c in T.StructType.fromJson(man["schema"]).fieldNames()
              if c not in keys]
    return ["content_sha"] if "content_sha" in fields else fields


class _DiffPartition(InputPartition):
    def __init__(self, root: str, keys: list[str], compare_cols: list[str],
                 dirs_from: list[str], dirs_to: list[str]) -> None:
        self.root = root
        self.keys = keys
        self.compare_cols = compare_cols
        self.dirs_from = dirs_from
        self.dirs_to = dirs_to


def _norm(v):
    """pyarrow/pandas scalar → plain python (None for NaN/NaT, datetime for
    timestamps, int for numpy ints) so tuples compare and serialize cleanly."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if hasattr(v, "to_pydatetime"):
        return v.to_pydatetime()
    if hasattr(v, "item"):
        return v.item()
    return v


def _resolve_state(root: str, dirs: list[str], keys: list[str],
                   compare_cols: list[str]) -> dict[tuple, tuple]:
    """LWW-resolved live state of one bucket (or dir set) as
    {key tuple: compare tuple} — the pyarrow mirror of the engine's
    ``_resolved`` contract: winner per key by max ``(_seq, _op)`` (string
    order 'U' > 'I' > 'D' is the engine's op rank), tombstone winners
    excluded. Column-pruned reads; files predating an additive evolution
    null-fill the missing columns."""
    import pandas as pd
    import pyarrow.parquet as pq

    want = [*keys, *compare_cols, "_seq", "_op"]
    frames = []
    for rel in dirs:
        d = os.path.join(root, rel)
        if not os.path.isdir(d):
            raise ValueError(
                f"data dir {rel} missing under {root} — version expired "
                f"(GC'd past retain_history) while the stream was reading"
            )
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(d, fn))
            have = [c for c in want if c in pf.schema_arrow.names]
            df = pf.read(columns=have).to_pandas()
            for c in want:
                if c not in df.columns:
                    df[c] = None
            frames.append(df[want])
    if not frames:
        return {}
    allrows = pd.concat(frames, ignore_index=True)
    # vectorized LWW: stable sort by (seq, op-rank), keep the last per key
    winners = (
        allrows.sort_values(["_seq", "_op"], kind="mergesort")
        .drop_duplicates(subset=keys, keep="last")
    )
    winners = winners[winners["_op"] != "D"]
    # (no itertuples: the _seq/_op names would be positional-renamed)
    cols = {c: winners[c].tolist() for c in (*keys, *compare_cols)}
    out: dict[tuple, tuple] = {}
    for i in range(len(winners)):
        k = tuple(_norm(cols[c][i]) for c in keys)
        out[k] = tuple(_norm(cols[c][i]) for c in compare_cols)
    return out


class _ChangelogStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.root = options["path"]
        self.starting = options.get("startingversion")
        man = _load_manifest(self.root)
        self.keys = list(man.get("keys") or [])
        self.cmp_cols = _compare_cols(man, self.keys, options.get("comparecols"))

    def initialOffset(self) -> dict:
        if self.starting is not None:
            v = int(self.starting)
            _manifest_at(self.root, v)  # validate readable now, fail fast
            return {"version": v}
        # default: changes from the CURRENT published version forward
        return {"version": _published_version(self.root)}

    def latestOffset(self) -> dict:
        return {"version": _published_version(self.root)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        v_from, v_to = int(start["version"]), int(end["version"])
        if v_from == v_to:
            return []
        man_a = _manifest_at(self.root, v_from)
        man_b = _manifest_at(self.root, v_to)
        keys, cmp_cols = self.keys, self.cmp_cols
        same_layout = (
            man_a.get("n_buckets") == man_b.get("n_buckets")
            and man_a.get("bucket_keys") == man_b.get("bucket_keys")
        )
        if not same_layout:
            # rebucket in range: bucket ids are not comparable — one full
            # diff (state-preserving rebucket ⇒ empty output; rare path)
            dirs_a = [r for b in man_a["buckets"] for r in _dirs_of(man_a, b)]
            dirs_b = [r for b in man_b["buckets"] for r in _dirs_of(man_b, b)]
            return [_DiffPartition(self.root, keys, cmp_cols, dirs_a, dirs_b)]
        parts = []
        for b in set(man_a["buckets"]) | set(man_b["buckets"]):
            da = _dirs_of(man_a, b) if b in man_a["buckets"] else []
            db = _dirs_of(man_b, b) if b in man_b["buckets"] else []
            if da != db:  # untouched buckets keep identical dir lists
                parts.append(_DiffPartition(self.root, keys, cmp_cols, da, db))
        return parts

    def read(self, partition: _DiffPartition) -> Iterator[tuple]:
        p = partition
        a = _resolve_state(p.root, p.dirs_from, p.keys, p.compare_cols)
        b = _resolve_state(p.root, p.dirs_to, p.keys, p.compare_cols)
        for k, payload in b.items():
            old = a.get(k)
            if old is None:
                yield (*k, "I", *payload)
            elif old != payload:
                yield (*k, "U", *payload)
        for k, payload in a.items():
            if k not in b:
                yield (*k, "D", *payload)  # 'D' carries the v_from payload

    def commit(self, end: dict) -> None:
        pass  # snapshots are immutable; the checkpoint offset log is the cursor


def _dirs_of(man: dict, b) -> list[str]:
    v = man["buckets"][str(b)]
    return list(v) if isinstance(v, list) else [v]


class LakeChangelogSource(DataSource):
    """``spark.readStream.format("lake-changelog").option("path", root)``.

    Options: ``path`` (table root, required), ``startingVersion`` (default:
    the published head at stream start — only NEW changes), ``compareCols``
    (comma list; default mirrors ``changes_between``)."""

    @classmethod
    def name(cls) -> str:
        return "lake-changelog"

    def schema(self) -> str:
        root = self.options["path"]
        man = _load_manifest(root)
        keys = list(man.get("keys") or [])
        schema = T.StructType.fromJson(man["schema"])
        cmp_cols = _compare_cols(man, keys, self.options.get("comparecols"))
        fields = []
        for k in keys:
            fields.append(f"{k} {schema[k].dataType.simpleString()}")
        fields.append("change_op string")
        for c in cmp_cols:
            fields.append(f"{c} {schema[c].dataType.simpleString()}")
        return ", ".join(fields)

    def streamReader(self, schema) -> _ChangelogStreamReader:
        return _ChangelogStreamReader(self.options)


def read_changelog_stream(spark, root: str, *, starting_version: int | None = None,
                          compare_cols: list[str] | None = None):
    """Register the source and open the stream (one-liner for consumers)."""
    spark.dataSource.register(LakeChangelogSource)
    r = spark.readStream.format("lake-changelog").option("path", root)
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    if compare_cols:
        r = r.option("compareCols", ",".join(compare_cols))
    return r.load()
