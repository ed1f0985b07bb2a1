import pytest

from wprdc_etl_spark.config import EngineConfig, build_session


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(
        app_name="wprdc-etl-spark-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )
    s = build_session(cfg)
    yield s
    s.stop()
