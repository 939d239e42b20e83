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

    # Warmup: JVM + whole-stage codegen + parquet footer cache — ALL
    # tables, not just the two biggest: the sub-second queries' one-shot
    # variance on a loaded box is dominated by cold footer/page reads of
    # the small tables (round-11, VERDICT r10 #7), and a footer count
    # per table costs ~2 s total.
    from osmart_etl_spark.io.sources import read_table

    for t in (
        "lineitem", "events", "orders", "customer", "part", "supplier",
        "nation", "region", "documents", "embeddings",
    ):
        try:
            read_table(spark, sf_dir, t).count()
        except Exception:  # warmup is best-effort; never let it void the bench
            pass

    def calibrate() -> float:
        """Fixed CPU-bound probe (no I/O, no shuffle): 200M xxhash64 in
        one codegen stage. Its time moves with box load/JIT only —
        recorded before and after the sweep so a regressed total can be
        attributed to machine weather vs code (VERDICT r12 #2). Runs
        twice, keeps the second (steady-state, JIT absorbed)."""
        best = None
        for _ in range(2):
            t0 = time.time()
            spark.range(0, 200_000_000, 1, 32).selectExpr(
                "bit_xor(xxhash64(id)) AS s"  # no-overflow fold (ANSI-safe)
            ).collect()
            best = time.time() - t0
        return round(best, 3)

    calib_before = calibrate()

    def run_once(qd) -> float:
        t0 = time.time()
        df = qd.fn(spark, sf_dir)
        # Force full evaluation of every output column (count alone
        # could let Catalyst prune the computation).
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    timings: dict[str, object] = {}
    errors: dict[str, str] = {}
    for name, qd in q.REGISTRY.items():
        # Best of two runs: steady-state timing (first run can absorb
        # codegen/footer-cache misses; machine noise on this box is ±25%).
        # Fault isolation: a transient executor crash in ONE query must not
        # void the whole bench record — each attempt is try/except'd with
        # one extra retry, failures record "ERR", and the JSON line is
        # always emitted.
        best = None
        attempts = 0
        dts: list[float] = []
        while attempts < 4:
            attempts += 1
            try:
                dt = run_once(qd)
            except Exception as exc:  # noqa: BLE001 - isolate any engine fault
                errors[name] = f"{type(exc).__name__}: {str(exc)[:200]}"
                continue
            dts.append(dt)
            best = min(dts)
            # Adaptive third run (round 13): this box shows multi-second
            # host-CPU noise bursts (calibration probe drifts 0.13-1.45 s
            # across sweeps); when BOTH runs land in a burst the recorded
            # best is pure weather (measured: a 0.14 s query recorded
            # 3.7 s). If the two runs disagree by >1.6x, one more run
            # disambiguates; stable queries still run exactly twice.
            if len(dts) == 2 and max(dts) > 1.6 * best:
                continue
            if len(dts) >= 2:
                break
        if best is None:
            timings[name] = "ERR"
        else:
            timings[name] = round(best, 3)
            errors.pop(name, None)
        # Cache hygiene BETWEEN queries (round 13, measured): many
        # queries persist intermediates (shingle sets, edge tables,
        # loop state) that stay pinned after their noop write finishes.
        # Over a 249-query sweep those dead blocks occupy the unified
        # memory pool and starve later queries' execution memory — the
        # iterative tier degraded up to 13x in-sweep vs isolated
        # (dedup_components 37.9 s in-sweep vs 4.2 s isolated; a 12-
        # query probe reproduced 18.6 s -> 3.3 s for
        # dedup_cluster_keep_best with this clear). Clearing AFTER a
        # query's timed runs keeps the methodology identical (best-of-2,
        # noop sink, every invocation computes from parquet — this also
        # guarantees no cross-QUERY cache reuse) and only removes the
        # leak. Timed regions still pay their own persist costs.
        spark.catalog.clearCache()

    calib_after = calibrate()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    ok = [v for v in timings.values() if isinstance(v, (int, float))]
    result = {
        "metric": "headline_queries_total",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_ok": len(ok),
        "n_err": len(timings) - len(ok),
        # load/noise indicator (VERDICT r12 #2): same fixed CPU probe
        # before and after the sweep; compare across rounds to separate
        # box weather from code regressions.
        "calib_sec": {"before": calib_before, "after": calib_after},
    }
    if errors:
        result["errors"] = errors

    # Full per-query record goes to a file: 246 timings overflow the
    # driver's output-tail capture (BENCH_r10.json recorded "parsed": null),
    # so the PRINTED line must stay compact enough to survive truncation.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)

    # Compact final line: total + per-pin ratio + a small headline subset.
    compact = dict(result)
    max_vs_pin = None
    try:
        with open(os.path.join(here, "BENCH_PINNED.json")) as fh:
            pin = json.load(fh).get("queries", {})
        ratios = {
            k: round(v / pin[k], 2)
            for k, v in timings.items()
            if isinstance(v, (int, float)) and isinstance(pin.get(k), (int, float)) and pin[k] > 0
        }
        if ratios:
            max_vs_pin = max(ratios.values())
    except Exception:
        pass
    headline = [
        "sales_payment_split", "segmented_replay", "star_join_revenue",
        "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
        "dedup_minhash_lsh", "dedup_exact", "ann_topk_per_label",
        "simhash_hamming_neardup", "text_quality_score", "tumbling_window_net",
        "asof_lookup", "upsert_keep_latest", "bpe_encode_corpus",
        "contamination_check", "calendar_scaffold",
    ]
    compact["queries"] = {
        k: timings[k] for k in headline if k in timings
    }
    if errors:
        compact["errors"] = {k: v[:80] for k, v in list(errors.items())[:5]}
    compact["full_record"] = "BENCH_FULL.json"
    if max_vs_pin is not None:
        compact["max_vs_pin"] = max_vs_pin
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
