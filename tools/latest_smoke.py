"""Measured comparison: latest-per-key via max(struct) vs the
ROW_NUMBER()=1 window idiom, at 10M synthetic events over varying key
cardinality. The struct-max plan shuffles one row per key per map
partition (partial_max combine); the window plan shuffles ALL rows and
sorts each partition. The gap should WIDEN as keys shrink relative to
rows (more combine leverage) — this records it.

Usage: python tools/latest_smoke.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

N = 10_000_000


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from osmart_etl_spark.session import get_spark

    # 10M-row persist needs real heap; get_spark leaves driver memory
    # to spark-submit, so set it here (local-mode driver == executor)
    spark = get_spark("latest-smoke", extra_conf={"spark.driver.memory": "16g"})
    spark.sparkContext.setLogLevel("ERROR")

    print(f"{'n_keys':>10s} {'struct_max':>10s} {'row_number':>10s} {'ratio':>6s}")
    for n_keys in (1_000, 100_000, 5_000_000):
        df = (
            spark.range(N)
            .select(
                (F.col("id") % n_keys).alias("k"),
                (F.col("id") * 2654435761 % 1_000_003).alias("ts"),
                F.col("id").alias("uid"),
                (F.col("id") % 97).cast("double").alias("payload"),
            )
            .persist()
        )
        df.count()

        def timed(fn):
            best = None
            for _ in range(2):
                t0 = time.time()
                fn()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            return best

        def via_struct():
            (
                df.groupBy("k")
                .agg(F.max(F.struct("ts", "uid", "payload")).alias("top"))
                .select("k", "top.ts", "top.uid", "top.payload")
                .write.format("noop").mode("overwrite").save()
            )

        def via_window():
            w = Window.partitionBy("k").orderBy(F.col("ts").desc(), F.col("uid").desc())
            (
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .drop("rn")
                .write.format("noop").mode("overwrite").save()
            )

        t_s = timed(via_struct)
        t_w = timed(via_window)
        print(f"{n_keys:10d} {t_s:10.2f} {t_w:10.2f} {t_w / t_s:6.2f}")
        df.unpersist()


if __name__ == "__main__":
    main()
