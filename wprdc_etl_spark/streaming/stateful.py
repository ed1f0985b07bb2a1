"""Custom stateful streaming operator via applyInPandasWithState.

The engine's core streaming dedup is the built-in
``dropDuplicatesWithinWatermark`` (B3 — always prefer built-ins). This module
is the escape hatch the reference's extensibility story maps to (arbitrary
per-row Python via marshmallow hooks → here: arbitrary *per-key state logic*
over Arrow batches): a high-watermark sequence tracker that drops events at
or below each key's last-seen ``event_sequence``.

Semantically stricter than dedup: it also drops REORDERED stale events
(sequence ≤ max seen), not just exact redeliveries — useful when the
downstream sink is append-only and cannot LWW. The lake merge doesn't need
it (LWW is sequence-aware), which is why it's an optional operator, not part
of IngestJob's default plan.

State: one int64 per key, bounded by a processing-time timeout.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType([T.StructField("max_seq", T.LongType())])


def _tracker(out_schema: T.StructType):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # the 1h idle timer fired with no new input: GC the key instead
            # of re-arming — otherwise idle-key state grows without bound
            state.remove()
            return
        (max_seq,) = state.get if state.exists else (-1,)
        for pdf in pdfs:
            fresh = pdf[pdf["event_sequence"] > max_seq]
            if len(fresh):
                # emit in sequence order; advance the per-key high watermark
                fresh = fresh.sort_values("event_sequence")
                max_seq = int(fresh["event_sequence"].max())
                yield fresh
        state.update((max_seq,))
        state.setTimeoutDuration(3_600_000)  # GC idle keys after 1h

    return fn


def drop_stale_per_key(
    df: DataFrame,
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming transform: per (repo, path, commit), drop events whose
    sequence is ≤ the key's high watermark (exact redeliveries AND stale
    reorders). Input must be a streaming DataFrame; output schema = input.
    """
    keys = keys or ["repo", "path", "commit"]
    out_schema = df.schema
    return (
        df.groupBy(*keys)
        .applyInPandasWithState(
            _tracker(out_schema),
            outputStructType=out_schema,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
