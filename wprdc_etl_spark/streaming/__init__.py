from wprdc_etl_spark.streaming.job import IngestJob, event_struct

__all__ = ["IngestJob", "event_struct"]
