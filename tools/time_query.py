"""Time one or more registry queries exactly the way bench.py does
(noop-write action, warmup tables, best-of-N) without running the full
206-query sweep. Usage:

    python tools/time_query.py minhash_estimate_quality [more ...] [--runs 3] [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        print(__doc__)
        return 2

    from osmart_etl_spark import queries as q
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.session import get_spark

    spark = get_spark("time-query")
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "lineitem").count()
    read_table(spark, sf_dir, "events").count()

    out = {}
    for name in names:
        qd = q.REGISTRY[name]
        times = []
        for _ in range(runs):
            t0 = time.time()
            df = qd.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"best": min(times), "all": times}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
