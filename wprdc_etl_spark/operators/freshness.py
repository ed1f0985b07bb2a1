"""Consumer-lag / freshness reporting: how far is the table behind the log?

The reference's SQLite ``Status`` table answers "when did this pipeline last
run" (SURVEY A24); the lake engine's lineage table (plans/lake.py
LINEAGE_SCHEMA) records the applied high-water per (job, batch, bucket).
``lag_report`` turns that into the operational question every CDC deployment
monitors: the applied sequence high-water, the log's head sequence, and the
number of log events not yet applied — the exact numbers a lag SLO/alert
consumes (Kafka consumer-lag semantics, but measured against the durable
lineage rather than a broker offset, so it survives checkpoint loss and
counts only COMMITTED progress).

Scale shape: the lineage scan is O(batches × buckets) metadata rows; the
log probes are one column-pruned max() and one count() under a pushed
``seq > applied`` filter — at a 10^10-event log the count scans only the
tail files past the cutoff once the log is sequence-range partitioned
(parquet row-group stats skip the rest), and no payload byte is ever read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lag_report(
    log_df: DataFrame,
    table,
    job: str,
    *,
    seq_col: str = "event_sequence",
) -> DataFrame:
    """One-row report: (job, applied_seq, head_seq, events_behind, caught_up).

    - ``applied_seq``: max ``last_seq`` over the job's committed lineage
      rows (NULL-safe: -1 when the job never committed).
    - ``head_seq``: max sequence in the log (the producer's head).
    - ``events_behind``: raw log events past ``applied_seq`` — includes
      events validation would quarantine, because lag is measured against
      the LOG, not against what the engine would keep.
    - ``caught_up``: events_behind == 0.
    """
    lin = table.read_lineage().where(F.col("job") == job)
    row = lin.agg(F.max("last_seq").alias("a")).collect()[0]
    applied = int(row["a"]) if row["a"] is not None else -1
    head_row = log_df.agg(F.max(seq_col).alias("h")).collect()[0]
    head = int(head_row["h"]) if head_row["h"] is not None else -1
    behind = log_df.where(F.col(seq_col) > F.lit(applied)).count()
    spark = log_df.sparkSession
    return spark.createDataFrame(
        [(job, applied, head, behind, behind == 0)],
        "job string, applied_seq long, head_seq long, events_behind long, caught_up boolean",
    )
