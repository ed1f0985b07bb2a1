from wprdc_etl_spark.operators.dedup import dedup_events, dedup_events_streaming
from wprdc_etl_spark.operators.latest import latest_per_key
from wprdc_etl_spark.operators.fingerprint import with_content_sha, state_fingerprint
from wprdc_etl_spark.operators.patch import normalize_patches, patch_merge
from wprdc_etl_spark.operators.skew import salted_repartition
from wprdc_etl_spark.operators.txn import gate_complete_txns, with_txn_metadata
from wprdc_etl_spark.operators.analytics import cohort_retention, funnel, iqr_outliers
from wprdc_etl_spark.operators.freshness import lag_report

__all__ = [
    "dedup_events",
    "dedup_events_streaming",
    "latest_per_key",
    "with_content_sha",
    "state_fingerprint",
    "normalize_patches",
    "patch_merge",
    "salted_repartition",
    "gate_complete_txns",
    "with_txn_metadata",
    "funnel",
    "cohort_retention",
    "iqr_outliers",
    "lag_report",
]
