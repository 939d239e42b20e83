"""Synthetic scale-amplification audit (round-8 task 1): measure the
dedup/LM/span/BPE families at 1x / 10x / 100x the base corpus and
check that wall time and shuffle bytes grow ~linearly — converting the
"designed for 100 TB" claim from argued (sf0.1 plans) to measured.

Construction — why the copies can't cheat the dedup semantics:
- ``documents`` copy k >= 1 rewrites the text by a per-copy AFFINE
  CHARACTER SUBSTITUTION on a-z (x -> a*x + b mod 26, one
  ``F.translate``; spaces/digits fixed). An alphabet bijection maps
  5-char shingles bijectively, so every intra-copy similarity relation
  (shared substrings -> shared shingles -> Jaccard / MinHash collision
  structure) is preserved EXACTLY, and text volume scales exactly *k.
  Cross-copy overlap is negligible: two copies' composed map is a
  non-identity affine map — same-``a`` pairs are pure shifts (ZERO
  fixed chars, disjoint shingles), different-``a`` pairs fix at most
  gcd(a'-1, 26) <= 13 chars, so a shared 5-shingle needs all 5 chars
  fixed (<= (1/2)^5 of shingles, Jaccard far below the LSH band
  threshold). Candidate pairs therefore grow LINEARLY in k — the true
  scaling of a k-times-larger corpus at constant duplication density.
  (A first attempt salted by interleaving chars; that COLLAPSES
  shingle diversity — every 5-window carries only ~2 original chars —
  and made each copy internally near-dup-dense: x10 candidates grew
  1291x instead of ~10x. Measured, fixed, and kept here as a warning:
  amplification transforms must be bijective AT THE OPERATOR'S
  GRANULARITY, which for 5-char shingles means char substitution,
  not insertion.)
- ``doc_id`` is offset by k * 10^9 (deterministic, collision-free).
- ``events`` copy k offsets ``event_id``/``user_id`` (new users with
  the same behavioral mix — volumes scale, key cardinality scales).
- JOIN TIER (round 9; part/supplier added round 10): ``orders``/
  ``customer``/``lineitem``/``part``/``supplier`` copy k offsets the
  FK chain consistently — ``c_custkey``/``o_custkey`` by k * 10^6,
  ``o_orderkey``/``l_orderkey`` by k * 10^9, ``p_partkey``/
  ``l_partkey`` by k * 10^6 and ``s_suppkey``/``l_suppkey`` by
  k * 10^5 — so every amplified order still resolves to exactly one
  amplified customer, every lineitem to its order/part/supplier: join
  FAN-OUT stays constant while both sides' volume AND key cardinality
  scale by k (the realistic growth mode: more customers/parts, not
  more rows per key — exactly how TPC-H's own SF scales every table
  except nation/region). Only ``c_nationkey``/``s_nationkey`` stay
  unchanged: nation/region are the only constant dims, so this tier
  catches a forced broadcast of ANY SF-linear table
  (orders/customer/part/supplier) by OOM or wall-time instead of by
  code reading — the round-9/10 defect class.
- Every other table is symlinked from the base sf dir unchanged.

Per run the tool scrapes the Spark UI REST API for the query's jobs
and reports wall seconds, total shuffle-read bytes, the widest stage,
and RED-FLAGS any 1-task stage reading >100k shuffle records (the
AQE serial-reduce pathology, see SCALE.md round 5).

Usage:
    python tools/amplify_smoke.py [base_sf_dir] [--factors 1,10,100]
                                  [--queries name,name,...]
Scratch:
    amplified tables are materialized once under
    /tmp/amplify_smoke/<base>_x<k>/ and reused across runs.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "containment_pairs",
    "dedup_span_excision",
    "dedup_components_bigstar",
    "lm_perplexity_filter",
    "bpe_train_merges",  # patched to 1 merge round (judge's spec)
    "daily_net_agg",
    "segmented_replay",
    # round-9 additions with a corpus-proportional shuffle
    "near_dup_rate_by_source",
    "dedup_cluster_size_histogram",
    "source_overlap_matrix",
    "source_minhash_overlap",
    # round-9 continued-session additions (measured linear on arrival)
    "dedup_edit_passjoin",
    "hll_portable_registers",
    "bm25_doc_retrieval",
]

# the embeddings tier (round 9, continued): vector ops at amplified
# volume. Copy k applies an ORTHOGONAL transform (coordinate rotation
# by k + deterministic sign pattern) — distances/cosines within a copy
# are preserved EXACTLY (so per-copy cluster/neighbor structure is the
# base corpus's), while copies are decorrelated against the fixed
# query-side hyperplanes/probes; vec_id offsets keep the base copy's
# ids lowest, so deterministic seed/probe selections stay the same.
EMB_QUERIES = [
    "kmeans_lloyd",
    "matryoshka_prefix_rerank",
    "ivf_build_assign",
    "pq_encode",
    "embedding_srp_neardup",
    "semdedup_keep_list",
]

# the skew tier (round 9, continued): volume-amplified events where each
# copy reassigns 30% of its rows to user_id 0 — a hot key that grows to
# ~30% of the whole table at x100. Uniform-key amplification (the
# default) can never expose a per-key serialization: this tier measures
# exactly the queries whose shuffles/windows key on user_id, where a hot
# key means one giant sort partition (the W2 skew study's question,
# asked of the whole user-keyed family).
SKEW_QUERIES = [
    "salted_skew_agg",
    "session_windows",
    "max_concurrent_sessions",
    "cumulative_distinct_users",
    "tumbling_window_net",
]

# the join tier (round 9): fact/fact-proportional joins at amplified
# volume — the measurement that catches a forced broadcast of
# orders/customer by OOM or wall-time instead of by code reading
JOIN_QUERIES = [
    "tpch_q3_shipping_priority",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "star_join_revenue",
    "sales_pipeline_full",
    "lm_perplexity_kneser_ney",  # round-9 single-occ-shuffle rework
    # round 10: part/supplier de-hinting probes + the composed EP3
    # chain (filtered union → replay → scaffold → sparse encode) at
    # the FK-offset construction
    "tpch_q2_min_cost_supplier",
    "item_cooccurrence_topk",
    "graph_pagerank",
    "stock_points_pipeline",
]


SKEW_HOT_FRACTION = 0.0  # set by --skew-tier (0.3)
JOIN_SKEW_FRACTION = 0.0  # set by --join-skew-tier (0.3): hot c_custkey

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_AFFINE_A = (1, 3, 7, 9, 11, 15, 17, 19, 21, 23, 25, 5)


def _permuted_alphabet(k: int) -> str:
    """Copy k's substitution image of a-z: x -> a*x + b mod 26 with
    (a, b) enumerated so k=0 is the identity and any two copies'
    composed map is a non-identity affine map (see module docstring)."""
    a = _AFFINE_A[(k // 26) % len(_AFFINE_A)]
    b = k % 26
    return "".join(_ALPHA[(a * i + b) % 26] for i in range(26))


def build_amplified(spark, base: str, factor: int) -> str:
    """Materialize <base>_x<factor> under /tmp/amplify_smoke (idempotent)."""
    from pyspark.sql import functions as F

    from osmart_etl_spark.io.sources import read_table

    name = os.path.basename(base.rstrip("/"))
    skew = f"_skew{int(SKEW_HOT_FRACTION * 100)}" if SKEW_HOT_FRACTION else ""
    if JOIN_SKEW_FRACTION:
        skew += f"_jskew{int(JOIN_SKEW_FRACTION * 100)}"
    out = f"/tmp/amplify_smoke/{name}_x{factor}_v6{skew}"
    done = f"{out}/_AMPLIFIED_OK"
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    docs = read_table(spark, base, "documents")
    events = read_table(spark, base, "events")
    orders = read_table(spark, base, "orders")
    customer = read_table(spark, base, "customer")
    lineitem = read_table(spark, base, "lineitem")
    part = read_table(spark, base, "part")
    supplier = read_table(spark, base, "supplier")
    emb = read_table(spark, base, "embeddings")
    doc_parts = [docs]
    ev_parts = [events]
    o_parts = [orders]
    c_parts = [customer]
    li_parts = [lineitem]
    p_parts = [part]
    s_parts = [supplier]
    emb_parts = [emb]
    for k in range(1, factor):
        perm = _permuted_alphabet(k)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * 1_000_000_000)).alias("doc_id"),
                F.translate(F.col("text"), _ALPHA, perm).alias("text"),
                "lang",
                "source",
                "n_chars",  # substitution preserves length exactly
            )
        )
        amp_uid = F.col("user_id") + F.lit(k * 1_000_000)
        if SKEW_HOT_FRACTION:
            # hot key: this fraction of every copy lands on user 0
            pct = int(SKEW_HOT_FRACTION * 10)
            amp_uid = F.when(
                F.col("event_id") % 10 < pct, F.lit(0).cast("bigint")
            ).otherwise(amp_uid)
        ev_parts.append(
            events.select(
                (F.col("event_id") + F.lit(k * 1_000_000_000)).alias("event_id"),
                "ts",
                amp_uid.alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
        # join tier: offset the orderkey/custkey FK chain consistently;
        # dim FKs (nationkey/partkey/suppkey) unchanged — see docstring
        amp_ck = F.col("o_custkey") + F.lit(k * 1_000_000)
        if JOIN_SKEW_FRACTION:
            # hot customer: this fraction of every copy's orders lands
            # on c_custkey 1 — the orders⋈customer skew probe
            pct = int(JOIN_SKEW_FRACTION * 10)
            amp_ck = F.when(
                F.col("o_orderkey") % 10 < pct, F.lit(1).cast("bigint")
            ).otherwise(amp_ck)
        o_parts.append(
            orders.select(
                (F.col("o_orderkey") + F.lit(k * 1_000_000_000)).alias("o_orderkey"),
                amp_ck.alias("o_custkey"),
                "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
            )
        )
        c_parts.append(
            customer.select(
                (F.col("c_custkey") + F.lit(k * 1_000_000)).alias("c_custkey"),
                "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
            )
        )
        # embeddings: orthogonal per-copy map — rotate coordinates by k
        # and flip a deterministic sign pattern. Orthogonal => all
        # intra-copy distances and cosines preserved bit-structure
        # (geometry identical), copies decorrelated vs fixed
        # query-side hyperplanes/probe vectors; vec_id offset keeps the
        # base copy's ids lowest (seed/probe selections unchanged).
        d_col = F.size("embedding")
        sgn = k % 5 + 1
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(k * 1_000_000)).alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(1), d_col),
                    lambda i: (
                        F.element_at(F.col("embedding"), ((i - 1 + F.lit(k)) % d_col) + 1)
                        * F.when((i * sgn) % 3 == 0, F.lit(-1.0)).otherwise(F.lit(1.0))
                    ).cast("float"),
                ).alias("embedding"),
                # label = coarse cluster id: copies are NEW clusters (the
                # orthogonal transform moved them), so cluster COUNT
                # scales with n at constant cluster size — the realistic
                # growth mode, same philosophy as the join tier's "more
                # customers, not more rows per key". Keeping labels fixed
                # instead is the adversarial knob-stress case: cluster
                # size grows xk and cluster-blocked pair work grows k^2
                # (measured: semdedup x100 fixed-label = 156M-pair HOF
                # dot stream at join parallelism <= |labels|, cut off at
                # 20+ min — SCALE.md).
                (F.col("label") + F.lit(k * 1_000_000)).alias("label"),
            )
        )
        li_parts.append(
            lineitem.select(
                (F.col("l_orderkey") + F.lit(k * 1_000_000_000)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(k * 1_000_000)).alias("l_partkey"),
                (F.col("l_suppkey") + F.lit(k * 100_000)).alias("l_suppkey"),
                "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate",
            )
        )
        # part/supplier copies: SF-linear dims (round 10) — key spaces
        # offset to match the lineitem FKs above; nationkey unchanged
        # (nation/region stay the only constant dims)
        p_parts.append(
            part.select(
                (F.col("p_partkey") + F.lit(k * 1_000_000)).alias("p_partkey"),
                "p_name", "p_brand", "p_type", "p_size", "p_retailprice",
            )
        )
        s_parts.append(
            supplier.select(
                (F.col("s_suppkey") + F.lit(k * 100_000)).alias("s_suppkey"),
                "s_name", "s_nationkey", "s_acctbal",
            )
        )

    def _write(parts, table):
        amp = parts[0]
        for p in parts[1:]:
            amp = amp.unionByName(p)
        # size output files like the base layout would at this volume
        amp.repartition(max(2, min(64, 2 * factor))).write.mode("overwrite").parquet(
            f"{out}/{table}.parquet"
        )

    _write(doc_parts, "documents")
    _write(ev_parts, "events")
    _write(o_parts, "orders")
    _write(c_parts, "customer")
    _write(li_parts, "lineitem")
    _write(p_parts, "part")
    _write(s_parts, "supplier")
    _write(emb_parts, "embeddings")
    amplified = (
        "documents", "events", "orders", "customer", "lineitem",
        "part", "supplier", "embeddings",
    )
    for t in TABLES:
        if t in amplified:
            continue
        link = f"{out}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{base.rstrip('/')}/{t}.parquet", link)
    with open(done, "w") as fh:
        fh.write("ok\n")
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base = args[0] if args else "/root/testdata/sf0.1"
    factors = [1, 10, 100]
    queries = DEFAULT_QUERIES
    for a in sys.argv[1:]:
        if a.startswith("--factors="):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
        if a == "--join-tier":
            queries = JOIN_QUERIES
        if a == "--emb-tier":
            queries = EMB_QUERIES
        if a == "--skew-tier":
            queries = SKEW_QUERIES
            global SKEW_HOT_FRACTION
            SKEW_HOT_FRACTION = 0.3
        if a == "--join-skew-tier":
            queries = ["star_join_revenue", "tpch_q3_shipping_priority",
                       "left_join_coalesce", "rollup_revenue"]
            global JOIN_SKEW_FRACTION
            JOIN_SKEW_FRACTION = 0.3

    import osmart_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from osmart_etl_spark.queries.base import REGISTRY
    from osmart_etl_spark.session import get_spark

    spark = get_spark(
        "amplify-smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4064"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # bpe at amplified scale: 1 merge round (the per-round shape is what
    # scales; 3 identical rounds just triple the wall time)
    from osmart_etl_spark.queries import bpe_train

    bpe_train._BPE_ITERS = 1

    dirs = {}
    for f in factors:
        t0 = time.time()
        dirs[f] = base if f == 1 else build_amplified(spark, base, f)
        print(f"# amplified x{f}: {dirs[f]} ({time.time() - t0:.1f}s)", file=sys.stderr)

    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def rest(path: str):
        return json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}"))

    results: dict[str, dict[int, dict]] = {}
    for qname in queries:
        if qname not in REGISTRY:
            print(f"!! unknown query {qname}", file=sys.stderr)
            continue
        results[qname] = {}
        for f in factors:
            spark.catalog.clearCache()
            seen_jobs = {j["jobId"] for j in rest("jobs")}
            t0 = time.time()
            REGISTRY[qname].fn(spark, dirs[f]).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            jobs = [j for j in rest("jobs") if j["jobId"] not in seen_jobs]
            stage_ids = {sid for j in jobs for sid in j.get("stageIds", [])}
            stages = [
                s
                for s in rest("stages")
                if s["stageId"] in stage_ids and s["status"] == "COMPLETE"
            ]
            sh_bytes = sum(s.get("shuffleReadBytes", 0) for s in stages)
            max_tasks = max((s["numCompleteTasks"] for s in stages), default=0)
            flags = [
                (s["stageId"], s.get("shuffleReadRecords", 0))
                for s in stages
                if s["numCompleteTasks"] == 1
                and s.get("shuffleReadRecords", 0) > 100_000
            ]
            results[qname][f] = {
                "wall_s": round(wall, 2),
                "shuffle_mb": round(sh_bytes / 1e6, 1),
                "max_tasks": max_tasks,
                "one_task_flags": flags,
            }
            print(
                f"{qname:28s} x{f:<4d} {wall:7.1f}s  shuffle {sh_bytes / 1e6:9.1f} MB"
                f"  widest stage {max_tasks:3d} tasks"
                + (f"  !! 1-TASK {flags}" if flags else ""),
                file=sys.stderr,
            )

    # markdown table + log-log slopes over the factor range
    print(f"\n| query | " + " | ".join(f"x{f} wall s" for f in factors)
          + " | " + " | ".join(f"x{f} shuffle MB" for f in factors)
          + " | time slope | shuffle slope | 1-task flags |")
    print("|" + "---|" * (2 * len(factors) + 4))
    for qname, r in results.items():
        fs = [f for f in factors if f in r]
        if len(fs) < 2:
            continue

        def slope(key: str) -> float:
            xs = [math.log(f) for f in fs]
            ys = [math.log(max(r[f][key], 1e-3)) for f in fs]
            mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
            return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
                (x - mx) ** 2 for x in xs
            )

        walls = " | ".join(f"{r[f]['wall_s']:.1f}" for f in fs)
        shs = " | ".join(f"{r[f]['shuffle_mb']:.0f}" for f in fs)
        flags = sum(len(r[f]["one_task_flags"]) for f in fs)
        print(
            f"| {qname} | {walls} | {shs} | {slope('wall_s'):.2f} |"
            f" {slope('shuffle_mb'):.2f} | {flags} |"
        )
    print(json.dumps({"base": base, "factors": factors, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
