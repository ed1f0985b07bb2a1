from wprdc_etl_spark.plans.lake import LakeTable, MergeResult, ParquetSnapshotTable
from wprdc_etl_spark.plans.replicate import TableReplicator
from wprdc_etl_spark.plans.router import TableRouter

__all__ = ["LakeTable", "MergeResult", "ParquetSnapshotTable", "TableReplicator", "TableRouter"]
