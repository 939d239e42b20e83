"""Scaling-curve probe: time representative queries across sf0.001 /
sf0.01 / sf0.1 (100× data range) and fit the log-log slope — the
empirical answer to "does this shape scale linearly or is something
super-linear hiding under the small-SF numbers".

Slope ≈ 1.0 → linear in data volume; ≪ 1 → overhead-dominated at these
sizes (fixed job/stage cost still amortizing); > 1.2 → super-linear,
investigate before 100 TB.

Usage: python tools/scaling_curve.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# one representative per physical shape class
DEFAULT = [
    "pii_scrub",               # scan-bound projection
    "daily_net_agg",           # shuffle aggregate
    "segmented_replay",        # single-exchange window stack
    "star_join_revenue",       # broadcast star join
    "dedup_minhash_lsh",       # banded LSH (single hash exchange)
    "dedup_ngram_jaccard",     # LSH + verify join
    "knn_cosine_topk",         # broadcast scan + partial top-k
    "paragraph_dedup",         # aggregate-then-join dedup
    "cms_heavy_hitters",       # sketch build (constant-size output)
    "user_behavior_similarity",  # inverted-index similarity
    "dedup_incremental_lsh",   # broadcast-probe incremental dedup
    "semdedup_keep_list",      # cluster-blocked dominator count
    "tpch_q21_waiting_suppliers",  # decorrelated double-EXISTS
    "latest_via_struct_max",   # agg-only latest-per-key
    "replica_segment_diff",    # two-scan anti-entropy checksum
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    from osmart_etl_spark import queries as q
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.session import get_spark

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    for sf in SFS:  # warm footer caches + JVM
        read_table(spark, sf, "events").count()

    print(f"{'query':32s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'slope':>6s}")
    for name in names:
        qd = q.REGISTRY[name]
        ts = []
        for sf in SFS:
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                qd.fn(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            ts.append(best)
        # least-squares slope of log(t) vs log(sf) over the 100× range
        xs = [math.log(0.001), math.log(0.01), math.log(0.1)]
        ys = [math.log(t) for t in ts]
        mx, my = sum(xs) / 3, sum(ys) / 3
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        print(
            f"{name:32s} {ts[0]:8.2f} {ts[1]:8.2f} {ts[2]:8.2f} {slope:6.2f}"
        )


if __name__ == "__main__":
    main()
