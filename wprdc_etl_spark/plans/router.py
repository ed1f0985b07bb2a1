"""Content-based table routing: one change log fanned out into per-route
lake tables.

The reference runs one wprdc-etl pipeline per CKAN resource
(`pipeline/pipeline.py::Pipeline` is bound to a single `resource_id` via
`CKANDatastoreLoader`, SURVEY A18); multiplexing one upstream feed into
several resources means running N pipelines that each re-read the source.
Production CDC engines solve this with content-based routing at the sink —
Debezium's ContentBasedRouter / topic-routing SMTs, Flink CDC side outputs —
so ONE validated scan of the log lands every event in exactly the table its
content selects.

`TableRouter` is that operator as a drop-in `LakeTable` sink: it satisfies
the full sink contract (`ensure/exists/read/merge/truncate`), so
`IngestJob`, batch replay, streaming foreachBatch, txn gating and WAP all
work unchanged with a router where a table used to be.

Semantics
- Routes are ordered `(name, predicate_sql, table)`; an event lands in the
  FIRST route whose predicate matches (Debezium SMT first-match), else in
  ``default`` when given, else it is dropped. Predicates are SQL boolean
  expressions over the validated batch columns — a plain string, so the
  DuckDB oracle can embed the identical text.
- Exactly-once per (job, batch_id, table): every member table keeps its own
  B8 commit guard, so a crash between per-table commits replays into a
  clean skip on the tables that already landed and a normal apply on the
  rest — per-table offsets, exactly the Kafka-Connect per-topic model.
- Job accounting (the Observation-driven ``finalize`` from
  IngestJob.apply_batch) is resolved by the FIRST route's merge — the
  CollectMetrics node sits below every route filter, so whichever action
  runs first observes the WHOLE batch — and job state (watermarks, lateness
  bounds) therefore lives in the primary (first) table; ``job_state`` /
  ``last_committed_batch`` read accordingly.

Scale shape: the routed batch is persisted once (``persist_batch``), then
each route's merge filters it — the upstream scan + validation run once, and
each per-table merge shuffles only its own slice. Route predicates compile
into the cached scan (codegen'd `CASE WHEN`), never Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import SinkCommitError
from wprdc_etl_spark.plans.lake import LakeTable, LineageCounts, MergeResult

DEFAULT_ROUTE = "__default__"


@dataclass
class RouteResult(MergeResult):
    """Aggregate MergeResult plus the per-route breakdown."""

    per_route: dict = field(default_factory=dict)


class TableRouter(LakeTable):
    """Fan one validated change-event batch out into per-route tables.

    ``routes``: ordered list of ``(name, predicate_sql, table)``. Names must
    be unique and tables distinct objects (one commit guard per table — the
    same table twice would skip its second slice as a duplicate batch).
    ``default``: optional table for events no predicate matches; without it
    unmatched events are dropped (add a catch-all default to account for
    every row).
    """

    def __init__(
        self,
        routes: list[tuple[str, str, LakeTable]],
        default: LakeTable | None = None,
        *,
        persist_batch: bool = True,
    ):
        if not routes:
            raise ValueError("TableRouter needs at least one route")
        names = [n for n, _, _ in routes]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate route names: {names}")
        if DEFAULT_ROUTE in names:
            raise ValueError(f"route name {DEFAULT_ROUTE!r} is reserved")
        tables = [t for _, _, t in routes] + ([default] if default is not None else [])
        if len({id(t) for t in tables}) != len(tables):
            raise ValueError(
                "each route needs its own table object: a shared table's "
                "commit guard would skip every slice after the first"
            )
        roots = [getattr(t, "root", None) for t in tables]
        real = [r for r in roots if r is not None]
        if len(set(real)) != len(real):
            raise ValueError(f"routes share a table root: {sorted(real)}")
        self.routes = list(routes)
        self.default = default

        self.persist_batch = persist_batch

    # ---- routing ------------------------------------------------------------

    def _route_col(self):
        # when-chain in declaration order = FIRST-match-wins
        head = None
        for name, pred, _ in self.routes:
            head = (
                F.when(F.expr(pred), F.lit(name))
                if head is None
                else head.when(F.expr(pred), F.lit(name))
            )
        if self.default is not None:
            return head.otherwise(F.lit(DEFAULT_ROUTE))
        return head  # unmatched -> NULL -> dropped

    def _all_routes(self) -> list[tuple[str, LakeTable]]:
        out = [(name, table) for name, _, table in self.routes]
        if self.default is not None:
            out.append((DEFAULT_ROUTE, self.default))
        return out

    # ---- LakeTable contract ---------------------------------------------------

    def exists(self) -> bool:
        return all(t.exists() for _, t in self._all_routes())

    def ensure(self, schema: T.StructType) -> None:
        for _, t in self._all_routes():
            t.ensure(schema)

    def truncate(self) -> None:
        for _, t in self._all_routes():
            t.truncate()

    def read(self) -> DataFrame:
        """Union of every member table's live state, tagged with ``_route``.

        Additive schema evolution can leave members with different column
        sets — unionByName null-fills the gaps."""
        dfs = [
            t.read().withColumn("_route", F.lit(name))
            for name, t in self._all_routes()
        ]
        return reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs
        )

    def merge(
        self,
        batch_df: DataFrame,
        *,
        job: str = "default",
        batch_id: int = 0,
        counts: LineageCounts | None = None,
        finalize: Optional[Callable] = None,
        staged: bool = False,
        **kw,
    ) -> RouteResult:
        # `staged` is explicit (not folded into **kw) so IngestJob's
        # build-time WAP capability check sees the router supports it; a
        # staged fan-out is the PREPARE phase of an atomic multi-table
        # publish (plans/txn_commit.py::MultiTablePublish over the member
        # tables) — without the coordinator the members' chains publish
        # independently, per-table.
        if staged:
            import inspect

            for name, table in self._all_routes():
                if "staged" not in inspect.signature(table.merge).parameters:
                    raise SinkCommitError(
                        f"route {name!r}: {type(table).__name__}.merge does "
                        f"not support staged=True — a partly-staged fan-out "
                        f"would break the publish atomicity"
                    )
            kw["staged"] = True
        routed = batch_df.withColumn("_route", self._route_col())
        if self.persist_batch:
            routed = routed.persist()
        per_route: dict[str, MergeResult] = {}
        try:
            first = True
            for name, table in self._all_routes():
                sub = routed.where(F.col("_route") == name).drop("_route")
                kwargs = dict(job=job, batch_id=batch_id, **kw)
                if first:
                    if finalize is not None:
                        kwargs["finalize"] = finalize
                    elif counts is not None:
                        kwargs["counts"] = counts
                elif counts is not None:
                    kwargs["counts"] = counts
                per_route[name] = table.merge(sub, **kwargs)
                first = False
        finally:
            if self.persist_batch:
                routed.unpersist()
        return RouteResult(
            applied=any(r.applied for r in per_route.values()),
            version=max(r.version for r in per_route.values()),
            rows_upserted=sum(r.rows_upserted for r in per_route.values()),
            rows_deleted=sum(r.rows_deleted for r in per_route.values()),
            n_affected_buckets=sum(
                r.n_affected_buckets for r in per_route.values()
            ),
            strategy="fanout",
            per_route=per_route,
        )

    # ---- job-state delegation (primary = first route's table) -----------------

    @property
    def _primary(self) -> LakeTable:
        return self.routes[0][2]

    def job_state(self, job: str) -> dict:
        return self._primary.job_state(job)  # type: ignore[attr-defined]

    def last_committed_batch(self, job: str) -> int | None:
        """Min over member tables — the safe replay point: every table's own
        guard skips what it already holds, so resuming from the laggard's
        position re-applies nothing anywhere else."""
        vals = [
            t.last_committed_batch(job)  # type: ignore[attr-defined]
            for _, t in self._all_routes()
        ]
        if any(v is None for v in vals):
            return None
        return min(vals)
