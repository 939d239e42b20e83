"""UDF/UDAF/UDTF surface validation (SURVEY.md §2.10): every escape
hatch re-expresses a natively-implemented operator and must agree with
it exactly."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def pay(spark):
    from osmart_etl_spark.io.sources import read_table

    ev = read_table(spark, SF_SMALL, "events")
    return ev.select(
        "event_id",
        F.col("value").alias("total"),
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(F.col("value") * 0.5)
        .alias("pagado"),
    ).cache()


def test_python_udf_matches_native(spark, pay):
    from osmart_etl_spark.functions import tag_issue_native, tag_issue_python_udf

    both = pay.select(
        "event_id",
        tag_issue_native(F.col("total"), F.col("pagado")).alias("a"),
        tag_issue_python_udf(F.col("total"), F.col("pagado")).alias("b"),
    )
    assert both.filter(~(F.col("a").eqNullSafe(F.col("b")))).count() == 0


def test_pandas_udf_matches_native(spark, pay):
    from osmart_etl_spark.functions import tag_issue_native, tag_issue_pandas_udf

    both = pay.select(
        tag_issue_native(F.col("total"), F.col("pagado")).alias("a"),
        tag_issue_pandas_udf(F.col("total"), F.col("pagado")).alias("b"),
    )
    assert both.filter(~(F.col("a").eqNullSafe(F.col("b")))).count() == 0


def test_iterator_pandas_udf_matches_least(spark, pay):
    from osmart_etl_spark.functions import waterfall_pandas_iter_udf

    capped = waterfall_pandas_iter_udf()
    both = pay.select(
        F.least(F.col("pagado"), F.col("total")).alias("a"),
        capped(F.col("total"), F.col("pagado")).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_grouped_agg_udaf(spark, pay):
    from osmart_etl_spark.functions import weighted_avg_grouped_agg

    from osmart_etl_spark.io.sources import read_table

    wavg = weighted_avg_grouped_agg()
    ev = read_table(spark, SF_SMALL, "events")
    got = (
        ev.groupBy("event_type")
        .agg(wavg(F.col("value"), F.col("user_id") + 1).alias("wa"))
        .collect()
    )
    want = {}
    for r in ev.select("event_type", "value", "user_id").collect():
        w = r["user_id"] + 1
        acc = want.setdefault(r["event_type"], [0.0, 0.0])
        acc[0] += r["value"] * w
        acc[1] += w
    for r in got:
        assert r["wa"] == pytest.approx(want[r["event_type"]][0] / want[r["event_type"]][1], rel=1e-9)


def test_udtf_matches_sequence_scaffold(spark):
    from osmart_etl_spark.functions import calendar_udtf

    spark.udtf.register("calendar_udtf", calendar_udtf)
    got = spark.sql(
        "SELECT * FROM calendar_udtf(DATE '2024-01-30', DATE '2024-02-03')"
    ).collect()
    days = [r["cal_date"] for r in got]
    assert days == [dt.date(2024, 1, 30) + dt.timedelta(days=i) for i in range(5)]

    native = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-30', DATE '2024-02-03', interval 1 day)) AS cal_date"
    ).collect()
    assert [r["cal_date"] for r in native] == days


def test_udtf_lateral_join(spark):
    """UDTF in a correlated LATERAL join — per-row table expansion, the
    per-key calendar scaffold shape (U8) through the UDTF surface."""
    from osmart_etl_spark.functions import calendar_udtf

    spark.udtf.register("calendar_udtf", calendar_udtf)
    spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), dt.date(2024, 1, 3)),
         (2, dt.date(2024, 2, 1), dt.date(2024, 2, 1))],
        ["k", "dmin", "dmax"],
    ).createOrReplaceTempView("bounds_t")
    rows = spark.sql(
        "SELECT k, c.cal_date FROM bounds_t, LATERAL calendar_udtf(dmin, dmax) c"
    ).collect()
    got = {(r["k"], r["cal_date"]) for r in rows}
    assert got == {
        (1, dt.date(2024, 1, 1)), (1, dt.date(2024, 1, 2)), (1, dt.date(2024, 1, 3)),
        (2, dt.date(2024, 2, 1)),
    }
