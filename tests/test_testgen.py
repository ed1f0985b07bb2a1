"""Fixture generator invariants (FIXTURES.md §1–§2)."""

import pytest
from pyspark.sql import functions as F

from wprdc_etl_spark.operators.fingerprint import state_fingerprint
from wprdc_etl_spark.testgen import (
    EVENT_COLUMNS,
    LANGS,
    gen_change_events,
    gen_source_code,
)

N = 4000


@pytest.fixture(scope="module")
def events(spark):
    return gen_change_events(spark, N).persist()


def test_deterministic(spark, events):
    again = gen_change_events(spark, N)
    cols = ["event_sequence", "op", "repo", "path", "commit", "content"]
    assert state_fingerprint(events, cols) == state_fingerprint(again, cols)


def test_columns_and_counts(events):
    assert events.columns == EVENT_COLUMNS
    total = events.count()
    assert total > N  # redeliveries inflate past N
    dups = total - events.dropDuplicates(["event_sequence"]).count()
    assert 0.01 * N < dups < 0.06 * N  # ~3% redeliveries


def test_op_mix(events):
    mix = dict(events.groupBy("op").count().collect())
    total = sum(mix.values())
    assert 0.6 < mix["I"] / total < 0.8
    assert 0.18 < mix["U"] / total < 0.32
    assert 0.02 < mix["D"] / total < 0.09


def test_delete_rows_have_null_content(events):
    assert events.where((F.col("op") == "D") & F.col("content").isNotNull()).count() == 0


def test_anomalies_present(events):
    bad_lang = events.where(~F.trim("lang").isin(*LANGS)).count()
    null_content_nond = events.where((F.col("op") != "D") & F.col("content").isNull()).count()
    assert bad_lang > 0 and null_content_nond > 0
    late = events.where(
        F.col("event_ts") < F.timestamp_seconds(F.lit(1_700_000_000) + F.col("event_sequence") - 1)
    ).count()
    assert late > 0


def test_skew_hot_repo(events):
    hot = events.where(F.col("repo") == "mega/monorepo").count()
    assert 0.15 * N < hot < 0.45 * events.count()


def test_same_key_multiple_events(events):
    """Distinct events must hit the same (repo,path,commit) so LWW is real."""
    multi = (
        events.dropDuplicates(["event_sequence", "repo", "path", "commit"])
        .groupBy("repo", "path", "commit")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert multi > 0


def test_license_phase(spark):
    ev = gen_change_events(spark, 1000, include_license=True)
    assert "license" in ev.columns
    with_lic = ev.where(F.col("license").isNotNull())
    assert with_lic.count() > 0
    assert with_lic.agg(F.min("event_sequence")).collect()[0][0] >= 900


def test_source_code_shape(spark):
    sc = gen_source_code(spark, 500)
    assert sc.columns == ["repo", "path", "commit", "lang", "content"]
    assert sc.count() == 500
    lens = sc.select(F.length("content").alias("l")).agg(F.min("l"), F.max("l")).collect()[0]
    assert lens[0] >= 50 and lens[1] <= 5000
