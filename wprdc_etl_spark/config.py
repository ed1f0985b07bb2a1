"""Engine configuration + SparkSession construction.

Parity: ``pipeline/pipeline.py::Pipeline.__init__`` / ``set_config_from_file``
read a sectioned JSON settings file and raise ``InvalidConfigException`` when
it is missing or malformed (SURVEY.md §2.1). Here config is a dataclass
(optionally loadable from JSON) and the "runtime" knobs are SparkConf entries
tuned for a shuffle-heavy CDC merge workload.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from wprdc_etl_spark.exceptions import InvalidConfigException


@dataclass
class EngineConfig:
    """Build-time configuration for an ingest job / test session."""

    app_name: str = "wprdc-etl-spark"
    master: str | None = None  # None → respect spark-submit / existing session
    shuffle_partitions: int = 32
    max_partition_bytes: str = "128m"
    # Streaming
    watermark_delay: str = "10 minutes"
    max_files_per_trigger: int = 8
    # Merge layout
    n_buckets: int = 32
    # Skew: extra salt buckets applied within hot keys before merge-apply
    salt_buckets: int = 8
    # AQE / broadcast
    auto_broadcast_threshold: str = "64m"

    extra_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_file(cls, path: str) -> "EngineConfig":
        """Load from a JSON settings file.

        Parity: ``pipeline/pipeline.py::set_config_from_file`` — missing or
        unparseable file → ``InvalidConfigException``.
        """
        if not os.path.exists(path):
            raise InvalidConfigException(f"settings file not found: {path}")
        try:
            with open(path, "r", encoding="utf-8") as fh:
                raw = json.load(fh)
        except (json.JSONDecodeError, OSError) as exc:
            raise InvalidConfigException(f"cannot parse settings file {path}: {exc}") from exc
        known = {f for f in cls.__dataclass_fields__}  # noqa: C401
        bad = set(raw) - known
        if bad:
            raise InvalidConfigException(f"unknown settings keys: {sorted(bad)}")
        return cls(**raw)


def build_session(cfg: EngineConfig | None = None, cpus: int | None = None) -> SparkSession:
    """Create (or get) a SparkSession tuned for the CDC merge workload.

    Tuning rationale (SURVEY.md §5): AQE on for runtime re-planning +
    skew-join splitting; partition coalescing on so small micro-batches don't
    fan out into thousands of empty shuffle partitions; Arrow on because the
    validation layer crosses JVM↔Python via pandas UDFs and per-row pickling
    would dominate at scale.
    """
    cfg = cfg or EngineConfig()
    builder = SparkSession.builder.appName(cfg.app_name)
    master = cfg.master
    if cpus is not None:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(cfg.shuffle_partitions),
        "spark.sql.files.maxPartitionBytes": cfg.max_partition_bytes,
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": cfg.auto_broadcast_threshold,
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # marshmallow `Time` parity (schema._TYPE_MAP['time']): Spark 4.1's
        # native TIME type ships behind this flag
        "spark.sql.timeType.enabled": "true",
        # snappy: the merge path is write-throughput-bound; zstd costs ~2×
        # CPU on the hot copy-on-write rewrites for ~25% smaller files —
        # flip per-table via extra_conf when storage dominates.
        "spark.sql.parquet.compression.codec": "snappy",
        "spark.ui.enabled": "false",
        # In local mode the driver JVM IS the executor: size its heap for the
        # workload (the box has 128 GiB; an 8g default heap evicts cached
        # merge batches mid-job at 10^7-event scale).
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g"),
        "spark.sql.shuffle.spill.compress": "true",
    }
    conf.update(cfg.extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
