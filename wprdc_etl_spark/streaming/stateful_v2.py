"""drop_stale_per_key on Spark 4's transformWithStateInPandas.

Same semantics as streaming/stateful.py (drop events whose sequence ≤ the
key's high watermark — exact redeliveries AND stale reorders), re-expressed
on the NEW arbitrary-stateful API: a ``StatefulProcessor`` with typed
``ValueState`` and real timers instead of applyInPandasWithState's single
tuple + timeout flag. Why both exist: applyInPandasWithState is the stable
HDFS-state-store path; transformWithState is the forward path (typed state
primitives, independent timers, state TTL, RocksDB store) — the engine keeps
the two behind one helper so pipelines can flip providers without touching
semantics (tests run the same assertions over both).

Requires the RocksDB state-store provider (Spark bundles it):
``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``
AND the ``protobuf`` Python package (the transformWithState worker protocol
is protobuf-framed). THIS SANDBOX lacks ``google.protobuf`` (no pip), so the
operator is capability-gated like plans/iceberg.py: ``available()`` is False
here, the test skips, and on a real image it activates unchanged — the
stable in-sandbox path is streaming/stateful.py (applyInPandasWithState).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """True iff the transformWithState worker protocol can run here (needs
    the protobuf Python package, absent in this sandbox)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

_STATE_SCHEMA = T.StructType([T.StructField("max_seq", T.LongType())])

# GC a key's high watermark after 1h of inactivity (same bound as v1)
_IDLE_TTL_MS = 3_600_000


class _HighWatermarkProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._max_seq = handle.getValueState("max_seq", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Tuple[Any, ...], rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        current = self._max_seq.get()[0] if self._max_seq.exists() else -1
        for pdf in rows:
            fresh = pdf[pdf["event_sequence"] > current]
            if len(fresh):
                fresh = fresh.sort_values("event_sequence")
                current = int(fresh["event_sequence"].max())
                yield fresh
        self._max_seq.update((current,))
        # one idle timer per key, re-armed on every input batch
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(
            timer_values.getCurrentProcessingTimeInMs() + _IDLE_TTL_MS
        )

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        # idle TTL fired with no new input: GC the key's state
        self._max_seq.clear()
        return iter(())

    def close(self) -> None:
        pass


def drop_stale_per_key_v2(
    df: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """transformWithStateInPandas twin of stateful.drop_stale_per_key."""
    keys = keys or ["repo", "path", "commit"]
    return df.groupBy(*keys).transformWithStateInPandas(
        _HighWatermarkProcessor(),
        outputStructType=df.schema,
        outputMode="append",
        timeMode="processingTime",
    )
