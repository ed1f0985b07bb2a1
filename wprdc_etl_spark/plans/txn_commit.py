"""Atomic multi-table publish: one transaction spanning several lake tables.

Why: `TableRouter` (plans/router.py) fans one validated change log into
per-route tables with per-table exactly-once guards — a crash between the
per-table commits is *eventually* consistent (replay finishes the rest) but
transiently exposes a half-landed fan-out. Real deployments also pair a main
table with derived tables (search index, SCD2 history, replication feed) and
want readers to observe them move together.

The reference has no analog (one wprdc-etl pipeline = one CKAN resource,
SURVEY A18/A21); the public-engine analogs are Iceberg's multi-table
transactions through a catalog (Nessie / REST-catalog commits) and the
classic presumed-nothing two-phase commit. This module is 2PC specialized to
WAP chains, with the lake's own staged/publish machinery as the prepare
phase:

- PREPARE — every participant table ingests its slice with ``staged=True``
  (plans/lake.py WAP): data is durable, versioned, invisible. This phase
  needs no coordinator; it is ordinary (guarded, exactly-once) ingest.
- DECIDE — ``MultiTablePublish.publish_all`` records ONE intent file
  (``commit-<txid>.json``, O_EXCL create + fsync) naming each table's staged
  head. The intent is the commit point: before it exists the transaction can
  only abort to "none"; once it exists recovery always drives to "all".
- COMMIT — each table gets one metadata-only ``publish(to_version=head)``
  CAS commit. A crash anywhere in this loop is repaired by ``recover()``,
  which replays the intents: ``publish(to_version=)`` is an idempotent no-op
  on tables already at/after their recorded head, and commits staged AFTER
  the intent was recorded are never dragged in.

What this gives and does not give (same contract as 2PC everywhere): atomic
DURABILITY — after crash+recover, either every table shows the transaction
or none does — but not cross-table read ISOLATION: a reader racing the
commit loop can see table A published microseconds before table B (each
table is individually snapshot-consistent throughout). Cross-table snapshot
isolation requires a shared catalog pointer, i.e. a different storage
layout, not a different protocol.

Scale shape: the coordinator does O(n_tables) tiny JSON writes and renames —
no Spark jobs, no data movement; all heavy lifting happened in the staged
merges. On a 1000-executor cluster this is sub-second regardless of data
volume.
"""

from __future__ import annotations

import json
import os
from typing import Mapping

from wprdc_etl_spark.exceptions import InvalidConfigException, SinkCommitError

_PREFIX = "commit-"
_DONE_SUFFIX = ".done.json"
_LIVE_SUFFIX = ".json"


def _fsync_write(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class MultiTablePublish:
    """Coordinator for atomic publish across WAP-staged lake tables.

    ``coordinator_dir`` holds the intent log; it must be on storage that
    survives the coordinator process (the same place checkpoints live).
    One coordinator directory = one transaction stream; txids are dense
    integers so ``pending()`` / ``recover()`` replay in commit order.
    """

    def __init__(self, coordinator_dir: str) -> None:
        self.dir = coordinator_dir
        os.makedirs(self.dir, exist_ok=True)

    # -- intent log -------------------------------------------------------

    def _intents(self, include_done: bool = False) -> list[str]:
        names = []
        for n in os.listdir(self.dir):
            if not n.startswith(_PREFIX):
                continue
            if n.endswith(_DONE_SUFFIX):
                if include_done:
                    names.append(n)
            elif n.endswith(_LIVE_SUFFIX):
                names.append(n)
        # numeric txid order, not lexicographic: 'commit-10' sorts before
        # 'commit-2' as a string, and the documented contract is that
        # pending()/recover() replay in commit order
        return sorted(names, key=lambda n: int(n[len(_PREFIX):].split(".")[0]))

    def pending(self) -> list[dict]:
        """Decided-but-unfinished transactions (crash evidence). Empty on a
        healthy stream."""
        out = []
        for n in self._intents():
            with open(os.path.join(self.dir, n)) as f:
                out.append(json.load(f))
        return out

    def _next_txid(self) -> int:
        # scan EVERY commit-* name (live, done, and abandoned .tmp claims)
        # so a txid is never reused across a crash
        mx = -1
        for n in os.listdir(self.dir):
            if not n.startswith(_PREFIX):
                continue
            stem = n[len(_PREFIX):].split(".")[0]
            if stem.isdigit():
                mx = max(mx, int(stem))
        return mx + 1

    @staticmethod
    def _check(tables: Mapping[str, object]) -> None:
        if not tables:
            raise InvalidConfigException("publish_all needs at least one table")
        for name, t in tables.items():
            for attr in ("publish", "abort_staged", "current_version", "root"):
                if not hasattr(t, attr):
                    raise InvalidConfigException(
                        f"table {name!r} does not support staged publish "
                        f"(missing {attr!r}); parquet snapshot tables only"
                    )

    # -- the protocol -----------------------------------------------------

    def publish_all(self, tables: Mapping[str, object]) -> dict[str, int]:
        """Atomically publish every table's open staged chain.

        Returns {name: published staged-head version}. Refuses to start
        while earlier intents are unfinished (run ``recover`` first) — a new
        transaction must not leapfrog a half-committed one."""
        self._check(tables)
        stale = self.pending()
        if stale:
            raise SinkCommitError(
                f"{len(stale)} unfinished transaction(s) in {self.dir}; "
                f"run recover() before publishing"
            )
        heads: dict[str, dict] = {}
        for name, t in tables.items():
            v = t.current_version()
            if v is None:
                raise SinkCommitError(f"table {name!r} does not exist yet")
            heads[name] = {"root": t.root, "to_version": int(v)}
        # WAL discipline for the decision record: claim a .tmp name with
        # O_EXCL (two coordinators racing the same dir cannot both claim a
        # txid), write + fsync the FULL intent there, then one atomic rename
        # to the live name — the rename IS the commit point. A hard kill
        # mid-write leaves only a .tmp, which pending()/recover() ignore
        # (never-decided ⇒ abortable) and whose txid is never reused.
        txid = self._next_txid()
        intent_path = os.path.join(self.dir, f"{_PREFIX}{txid}{_LIVE_SUFFIX}")
        tmp_path = intent_path + ".tmp"
        try:
            fd = os.open(tmp_path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError as e:
            raise SinkCommitError(
                f"concurrent coordinator activity on {self.dir} "
                f"(txid {txid} already claimed)"
            ) from e
        try:
            with os.fdopen(fd, "w") as f:
                json.dump({"txid": txid, "tables": heads}, f, indent=1)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp_path, intent_path)
        except BaseException:
            # decision never became durable-and-complete: scrap the claim
            try:
                os.unlink(tmp_path)
            except OSError:
                pass
            raise
        self._commit_intent({"txid": txid, "tables": heads}, tables)
        return {n: heads[n]["to_version"] for n in heads}

    def _commit_intent(self, intent: dict, tables: Mapping[str, object]) -> None:
        by_root = {t.root: t for t in tables.values()}
        for name, rec in intent["tables"].items():
            t = by_root.get(rec["root"])
            if t is None:
                raise SinkCommitError(
                    f"recover needs a handle for table {name!r} at "
                    f"{rec['root']!r} (not among the provided tables)"
                )
            t.publish(to_version=int(rec["to_version"]))
        txid = intent["txid"]
        os.replace(
            os.path.join(self.dir, f"{_PREFIX}{txid}{_LIVE_SUFFIX}"),
            os.path.join(self.dir, f"{_PREFIX}{txid}{_DONE_SUFFIX}"),
        )

    def recover(self, tables: Mapping[str, object]) -> list[int]:
        """Finish every decided-but-unfinished transaction (idempotent —
        safe to run on every job start, like checkpoint restore). Returns
        the txids completed."""
        self._check(tables)
        done = []
        for intent in self.pending():
            self._commit_intent(intent, tables)
            done.append(int(intent["txid"]))
        return done

    def abort_all(self, tables: Mapping[str, object]) -> dict[str, int]:
        """Pre-decision rollback: discard every table's open staged chain
        (plans/lake.py ``abort_staged`` — guard entries vanish, a replay
        re-ingests). Only legal while no intent is pending: after the
        decision the transaction must roll FORWARD via ``recover``."""
        self._check(tables)
        if self.pending():
            raise SinkCommitError(
                "cannot abort: a decided transaction is pending; run recover()"
            )
        return {name: int(t.abort_staged()) for name, t in tables.items()}
