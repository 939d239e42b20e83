"""Shuffle audit: execute queries and report MEASURED data movement from
the executed plan's SQL metrics — scanned bytes/rows vs shuffled bytes/
rows vs broadcast bytes. This is the number the scale story rests on:
a query that scans 220 MB but shuffles 90 KB has earned its shape;
one that shuffles what it scans has not.

Usage: python tools/shuffle_audit.py [query ...]   (defaults below)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.1"

DEFAULT = [
    "sales_payment_split",
    "daily_net_agg",
    "star_join_revenue",
    "segmented_replay",
    "tpch_q1_pricing_summary",
    "tpch_q21_waiting_suppliers",
    "dedup_minhash_lsh",
    "dedup_incremental_lsh",
    "paragraph_dedup",
    "knn_cosine_topk",
    "stratified_split_assign",
    "corpus_training_pipeline",
]


def collect_metrics(df) -> dict:
    """Run the DataFrame's OWN QueryExecution (toRdd().count() — no
    driver collect of row content) and roll up scan/shuffle/broadcast
    metrics over the final adaptive plan, deduped by node id so reused
    exchanges count once."""
    qe = df._jdf.queryExecution()
    out_rows = qe.toRdd().count()
    ep = qe.executedPlan()
    try:
        ep = ep.finalPhysicalPlan()
    except Exception:  # noqa: BLE001 - non-AQE root has no final plan
        pass

    seen: set[int] = set()
    agg = {
        "scan_bytes": 0,
        "scan_rows": 0,
        "scan_files": 0,
        "shuffle_bytes": 0,
        "shuffle_rows": 0,
        "n_exchanges": 0,
        "broadcast_bytes": 0,
        "n_broadcasts": 0,
        "out_rows": out_rows,
    }

    def walk(node) -> None:
        nid = node.id()
        if nid in seen:
            return
        seen.add(nid)
        name = node.nodeName()
        it = node.metrics().iterator()
        m = {}
        while it.hasNext():
            kv = it.next()
            m[kv._1()] = kv._2().value()
        if name.startswith("Scan "):
            agg["scan_bytes"] += m.get("filesSize", 0)
            agg["scan_rows"] += m.get("numOutputRows", 0)
            agg["scan_files"] += m.get("numFiles", 0)
        elif name == "Exchange":
            agg["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
            agg["shuffle_rows"] += m.get("shuffleRecordsWritten", 0)
            agg["n_exchanges"] += 1
        elif name == "BroadcastExchange":
            agg["broadcast_bytes"] += m.get("dataSize", 0)
            agg["n_broadcasts"] += 1
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        cls = node.getClass().getName()
        if "QueryStage" in cls:
            walk(node.plan())
        if name == "AdaptiveSparkPlan":
            # nested AQE root (e.g. inside a cached subplan)
            try:
                walk(node.finalPhysicalPlan())
            except Exception:  # noqa: BLE001
                pass
        # InMemoryTableScan (persisted subplans): metrics live under the
        # cached relation's child plan
        if name == "InMemoryTableScan":
            try:
                walk(node.relation().cachedPlan())
            except Exception:  # noqa: BLE001
                pass

    walk(ep)
    return agg


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    from osmart_etl_spark import queries as q
    from osmart_etl_spark.session import get_spark

    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")

    hdr = (
        f"{'query':34s} {'scan MB':>8s} {'scan rows':>10s} {'shuf MB':>8s} "
        f"{'shuf rows':>10s} {'#ex':>4s} {'bcast MB':>9s} {'shuf/scan':>9s}"
    )
    print(hdr)
    for name in names:
        df = q.REGISTRY[name].fn(spark, SF)
        m = collect_metrics(df)
        ratio = (m["shuffle_bytes"] / m["scan_bytes"]) if m["scan_bytes"] else float("nan")
        print(
            f"{name:34s} {m['scan_bytes']/1e6:8.1f} {m['scan_rows']:10d} "
            f"{m['shuffle_bytes']/1e6:8.2f} {m['shuffle_rows']:10d} "
            f"{m['n_exchanges']:4d} {m['broadcast_bytes']/1e6:9.2f} {ratio:9.3f}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
