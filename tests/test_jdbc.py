"""Live JDBC roundtrip over embedded Derby (S1/S2/S4) — the driver jars
ship inside the pyspark distribution, so the scan path that was
config-complete-but-unverified in rounds 1-2 executes for real here:
write via DataFrameWriter.jdbc, read back via jdbc_scan, including the
range-partitioned parallel read (S4) and an explicit driver class (S2).
Ref: etl_sales/extract.py:8-28, etl_inventory/extract.py:8-22,
seed_raw_stock_movements.py:38-60 (the hand-rolled range batcher S4
replaces)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(DRIVER)
        return True
    except Exception:  # noqa: BLE001
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("Derby driver not on Spark classpath")
    db = tmp_path_factory.mktemp("derby") / "testdb"
    return f"jdbc:derby:{db};create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    df = spark.range(0, 1000).select(
        F.col("id").alias("movement_id"),
        (F.col("id") % 7).alias("store_id"),
        (F.col("id") * 3 % 100).cast("double").alias("qty"),
    )
    df.write.format("jdbc").option("url", derby_url).option(
        "dbtable", "movements"
    ).option("driver", DRIVER).mode("overwrite").save()
    return df


def test_jdbc_roundtrip_table(spark, derby_url, seeded):
    """S1: plain table scan returns exactly what was written."""
    from osmart_etl_spark.io.sources import jdbc_scan

    out = jdbc_scan(spark, derby_url, "movements", driver=DRIVER)
    assert out.count() == 1000
    assert {r["movement_id"] for r in out.filter(F.col("store_id") == 3).collect()} == {
        i for i in range(1000) if i % 7 == 3
    }


def test_jdbc_partitioned_parallel_read(spark, derby_url, seeded):
    """S4: range-partitioned read — N partition queries, same rows, and
    the scan genuinely splits into numPartitions input partitions."""
    from osmart_etl_spark.io.sources import jdbc_scan

    out = jdbc_scan(
        spark,
        derby_url,
        "movements",
        driver=DRIVER,
        partition_column="movement_id",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert out.rdd.getNumPartitions() == 4
    assert out.count() == 1000
    total = out.agg(F.sum("movement_id").alias("s")).collect()[0]["s"]
    assert total == sum(range(1000))


def test_jdbc_subquery_pushdown(spark, derby_url, seeded):
    """S1: parenthesized subquery executes source-side (the reference
    pushes date/store predicates into every SQL branch)."""
    from osmart_etl_spark.io.sources import jdbc_scan

    # Spark's JDBC writer creates case-exact quoted identifiers; Derby
    # case-folds unquoted ones, so the source-side SQL quotes them.
    out = jdbc_scan(
        spark,
        derby_url,
        '(SELECT "movement_id", "qty" FROM movements WHERE "store_id" = 2) t',
        driver=DRIVER,
    )
    assert out.columns == ["movement_id", "qty"]
    assert out.count() == len([i for i in range(1000) if i % 7 == 2])


def test_jdbc_multi_database_union(spark, tmp_path_factory):
    """S3: the same extract from two physical databases, unioned with a
    provenance column — ref etl_sales/extract.py:21-26."""
    if not _derby_available(spark):
        pytest.skip("Derby driver not on Spark classpath")
    from osmart_etl_spark.io.sources import jdbc_scan, union_databases

    frames = []
    for name in ("tienda_a", "tienda_b"):
        db = tmp_path_factory.mktemp("derby_multi") / name
        url = f"jdbc:derby:{db};create=true"
        spark.range(0, 50).select(F.col("id").alias("sale_id")).write.format(
            "jdbc"
        ).option("url", url).option("dbtable", "sales").option("driver", DRIVER).mode(
            "overwrite"
        ).save()
        frames.append(
            jdbc_scan(spark, url, "sales", driver=DRIVER).withColumn(
                "source_db", F.lit(name)
            )
        )
    out = union_databases(frames)
    assert out.count() == 100
    assert out.groupBy("source_db").count().count() == 2
