"""IO source tests: CSV with explicit schema (S5), quarantine sink
roundtrip (S9), schema-checked parquet reads."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from tests.conftest import SF_SMALL


def test_csv_roundtrip_with_schema(spark, tmp_path):
    """S5 — the reference's exclusions-registry CSV
    (dq_exclusions_csv.py:53-55, dtype=str): write, read back with a
    declared schema, values survive."""
    from osmart_etl_spark.io.sources import read_csv, read_table

    ev = read_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    p = str(tmp_path / "registry_csv")
    ev.write.option("header", "true").csv(p)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    back = read_csv(spark, p, schema)
    assert back.count() == ev.count()
    a = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in back.collect()}
    b = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in ev.collect()}
    assert a == b


def test_quarantine_sink_roundtrip(spark, tmp_path):
    """S9 — append-mode quarantine parquet with read-time dedup (U5)."""
    from osmart_etl_spark.dq import quarantine
    from osmart_etl_spark.io.sinks import write_quarantine
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.ops.reshape import dedup_by_key

    ev = read_table(spark, SF_SMALL, "events")
    res = quarantine(ev, {"big": F.col("value") > 150}, ["user_id", "event_id"])
    p = str(tmp_path / "quarantine")
    write_quarantine(res.quarantined, p)
    write_quarantine(res.quarantined, p)  # double-append (re-run)

    back = spark.read.parquet(p)
    assert back.count() == 2 * res.quarantined.count()
    deduped = dedup_by_key(back, ["uniq"])
    assert deduped.count() == res.quarantined.count()
