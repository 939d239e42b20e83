"""Multi-writer contention probe for the versioned merge sink
(io/sinks.merge_upsert_partitioned) — VERDICT r10 #6.

The per-bucket CAS protocol has crash-injection tests but no measured
contention numbers. This probe runs W concurrent writers (threads over
one SparkSession — the CAS primitive is filesystem-level, so threads
race exactly like separate drivers on the commit log) in two regimes:

- ``disjoint``: each writer upserts keys pre-filtered to ITS OWN bucket
  set (bucket id % W == writer id) — zero expected conflicts; measures
  the protocol's parallel throughput floor.
- ``overlap``: every writer upserts the SAME key range — every bucket
  contested; measures ConcurrentCommitError retry rates and the
  convergence cost of the retry-from-fresh-snapshot rule.

Each writer retries a failed merge with exponential backoff + jitter
(base 0.1 s, cap 2 s) — the documented backoff rule. After the storm,
the table is read back and checked against the serial keep-latest
expectation (max order wins per key), so the probe is also a
correctness gate under contention.

Usage::

    python tools/merge_contention_probe.py [n_writers] [n_rounds] [out_json]

Results land in SCALE.md ("Merge sink under contention").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_KEYS = 5_000
N_BUCKETS = 32
KEYS = ["k1", "k2"]
ORDER = "ver"


def _batch(spark, writer_id: int, rnd: int, keys_filter=None):
    """Deterministic batch: every key gets ver = rnd*100 + writer_id so
    the serial expectation is computable (max ver wins)."""
    df = spark.range(N_KEYS).select(
        F.col("id").cast("int").alias("k1"),
        (F.col("id") % 7).cast("int").alias("k2"),
        (F.col("id").cast("double") + writer_id * 0.001).alias("v"),
        F.lit(rnd * 100 + writer_id).cast("int").alias("ver"),
    )
    if keys_filter is not None:
        df = df.filter(keys_filter)
    return df


def _bucket_of():
    return F.pmod(F.hash(F.col("k1"), F.col("k2")), F.lit(N_BUCKETS))


def run_storm(spark, path: str, n_writers: int, n_rounds: int, regime: str) -> dict:
    from osmart_etl_spark.io.atomic import ConcurrentCommitError
    from osmart_etl_spark.io.sinks import merge_upsert_partitioned

    stats = {
        w: {"merges": 0, "retries": 0, "backoff_s": 0.0} for w in range(n_writers)
    }
    errors: list[str] = []

    def writer(w: int) -> None:
        for rnd in range(n_rounds):
            flt = (
                _bucket_of() % n_writers == w if regime == "disjoint" else None
            )
            batch = _batch(spark, w, rnd, flt)
            attempt = 0
            while True:
                try:
                    merge_upsert_partitioned(
                        spark, batch, path, KEYS, ORDER, n_buckets=N_BUCKETS
                    )
                    stats[w]["merges"] += 1
                    break
                except ConcurrentCommitError:
                    # documented backoff rule: exponential with full
                    # jitter, base 0.1 s, cap 2 s — deterministic seed
                    # per (writer, attempt) for rerun stability
                    stats[w]["retries"] += 1
                    attempt += 1
                    delay = min(2.0, 0.1 * (2 ** (attempt - 1)))
                    delay *= 0.5 + ((w * 1009 + attempt * 9176) % 1000) / 2000.0
                    stats[w]["backoff_s"] += delay
                    time.sleep(delay)
                except Exception as exc:  # noqa: BLE001 — probe must report
                    errors.append(f"w{w} r{rnd}: {type(exc).__name__}: {exc}"[:300])
                    return

    t0 = time.monotonic()
    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0

    # correctness under contention: keep-latest says max ver wins per key
    from osmart_etl_spark.io.sinks import read_merge_table

    got = read_merge_table(spark, path)
    n_rows = got.count()
    # every surviving row must come from the LAST round; in the overlap
    # regime keep-latest further forces the highest writer id's version
    # (max ver wins regardless of commit interleaving — a lower final
    # ver would be a lost update the CAS failed to catch)
    if regime == "overlap":
        expected_ver = (n_rounds - 1) * 100 + (n_writers - 1)
        n_stale = got.filter(F.col("ver") != expected_ver).count()
    else:
        n_stale = got.filter(
            (F.col("ver") / 100).cast("int") != n_rounds - 1
        ).count()

    total_retries = sum(s["retries"] for s in stats.values())
    total_merges = sum(s["merges"] for s in stats.values())
    return {
        "regime": regime,
        "n_writers": n_writers,
        "n_rounds": n_rounds,
        "wall_s": round(wall, 2),
        "merges_ok": total_merges,
        "retries": total_retries,
        "retry_rate": round(total_retries / max(total_merges, 1), 3),
        "backoff_s_total": round(sum(s["backoff_s"] for s in stats.values()), 2),
        "merges_per_s": round(total_merges / wall, 2),
        "rows_final": n_rows,
        "rows_expected": N_KEYS,
        "stale_round_rows": n_stale,
        "errors": errors,
    }


def run_accumulate_storm(spark, table: str, n_writers: int, n_rounds: int) -> dict:
    """W writers concurrently folding DISTINCT batches into one
    ``merge_accumulate_versioned`` table — the additive sink's lost-update
    scenario. Serial expectation: every key sums to n_writers × n_rounds."""
    import threading

    from osmart_etl_spark.io.atomic import read_committed
    from osmart_etl_spark.io.sinks import merge_accumulate_versioned

    stats = {"applied": 0, "errors": []}
    lock = threading.Lock()

    def writer(w: int) -> None:
        for rnd in range(n_rounds):
            batch = spark.range(N_KEYS).select(
                F.col("id").alias("k"), F.lit(1).cast("bigint").alias("n")
            )
            try:
                ok = merge_accumulate_versioned(
                    spark, batch, table, keys=["k"], sum_cols=["n"],
                    batch_id=f"w{w}-r{rnd}", max_retries=12,
                )
                with lock:
                    stats["applied"] += int(ok)
            except Exception as exc:  # noqa: BLE001 — probe must report
                with lock:
                    stats["errors"].append(f"w{w} r{rnd}: {exc}"[:300])
                return

    t0 = time.monotonic()
    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    got = read_committed(spark, table)
    want = n_writers * n_rounds
    return {
        "regime": "accumulate",
        "n_writers": n_writers,
        "n_rounds": n_rounds,
        "wall_s": round(wall, 2),
        "applied": stats["applied"],
        "rows_final": got.count(),
        "rows_expected": N_KEYS,
        "wrong_sum_rows": got.filter(F.col("n") != want).count(),
        "errors": stats["errors"],
    }


def main() -> None:
    n_writers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.scheduler.mode", "FAIR")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for regime in ("disjoint", "overlap"):
        tmp = tempfile.mkdtemp(prefix=f"merge_storm_{regime}_")
        try:
            results[regime] = run_storm(
                spark, f"{tmp}/tbl", n_writers, n_rounds, regime
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    tmp = tempfile.mkdtemp(prefix="merge_storm_accumulate_")
    try:
        results["accumulate"] = run_accumulate_storm(
            spark, f"{tmp}/tbl", n_writers, n_rounds
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(line)


if __name__ == "__main__":
    main()
