"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action that forces full
computation without collecting results to the driver. The first query
absorbs JVM/codegen warmup; a throwaway warmup query runs first so
per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from osmart_etl_spark import queries as q
    from osmart_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + whole-stage codegen + parquet footer cache.
    from osmart_etl_spark.io.sources import read_table

    read_table(spark, sf_dir, "lineitem").count()
    read_table(spark, sf_dir, "events").count()

    timings: dict[str, float] = {}
    for name, qd in q.REGISTRY.items():
        # Best of two runs: steady-state timing (first run can absorb
        # codegen/footer-cache misses; machine noise on this box is ±25%).
        best = None
        for _ in range(2):
            t0 = time.time()
            df = qd.fn(spark, sf_dir)
            # Force full evaluation of every output column (count alone
            # could let Catalyst prune the computation).
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
