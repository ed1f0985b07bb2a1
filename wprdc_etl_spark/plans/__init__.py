from wprdc_etl_spark.plans.lake import LakeTable, MergeResult, ParquetSnapshotTable

__all__ = ["LakeTable", "MergeResult", "ParquetSnapshotTable"]
