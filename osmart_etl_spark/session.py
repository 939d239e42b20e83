"""SparkSession factory with scale-aware defaults.

Local testing runs on ``local[N]`` (single JVM), but every config choice
here is made for the real target: a multi-executor cluster reading ~100 TB.

Key choices
-----------
- **AQE on** (``spark.sql.adaptive.enabled``): runtime coalescing of
  shuffle partitions, auto skew-join splitting, and dynamic
  broadcast-join demotion/promotion. At 100 TB the static
  ``shuffle.partitions`` is only an upper bound; AQE right-sizes it.
- **shuffle.partitions** defaults to ``max(2*cores, 32)`` locally; on a
  cluster this should be ~2-3x total executor cores (set via submit conf,
  not code). AQE coalesces down, so over-provisioning is cheap.
- **Arrow enabled** for the Pandas-UDF escape hatches (grouped replay,
  embedding kernels): Arrow batch transfer is the only acceptable
  Python<->JVM path in a hot loop.
- **Session timezone UTC**: the reference pins business time to
  America/Mexico_City at the edge (stock_points_helpers.py:7-8) and
  strips tz before storage; we keep storage/compute in UTC and convert
  at the edges with from_utc_timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osmart-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``; on a real cluster, leave master to spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(2 * n, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce to the target partition size rather than preserving
        # max parallelism: fewer, right-sized tasks — less scheduler
        # overhead on small stages, same behavior on big ones (the
        # setting the Spark tuning guide recommends for efficiency).
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (io/pydatasource.py) — off
        # by default in Spark 4.1; reader init fails without it when a
        # source implements pushFilters.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Round 13 (measured): InferFiltersFromGenerate turns every
        # explode(expensive_array_expr) into a size(expr)>0 filter that
        # Catalyst pushes through projects/exchanges down to the SCAN,
        # re-evaluating the full expression per row a second time —
        # for the shingle/minhash family the whole normalize+shingle
        # transform ran serially in the single-task scan stage (14.4 s
        # of the 19.2 s cold dedup_minhash_lsh; cold fell to 6.6 s with
        # the rule excluded). Our generators are all fed by computed,
        # never-empty arrays (shingle_array yields >=1 element by
        # construction), so the inferred filter prunes nothing and
        # costs a duplicate O(corpus) evaluation — at 100 TB that is
        # pure wasted CPU on every scan task. Purely physical: results
        # are identical (full oracle parity re-run under this config,
        # PARITY_r13.json).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.session.timeZone", "UTC")
        # 100 TB scans: bound per-task input so partitions fit in memory.
        .config("spark.sql.files.maxPartitionBytes", "256m")
        # Keep driver results small; operators must never collect data.
        .config("spark.driver.maxResultSize", "2g")
        # local[N] puts all N executor threads in the driver JVM; the
        # 1g default heap made round-3's bench flaky under concurrent
        # wide joins (BENCH_r03 rc=1 was an executor OOM-crash), and 6g
        # left ~100 MB of execution memory per thread — enough for the
        # bench tier but starved 32 concurrent multi-million-row sorts
        # in the round-10 x100 amplification runs. 10g ≈ 300 MB of
        # execution memory per thread, still far below a real
        # executor's per-core share. On a cluster this maps to
        # spark.executor.memory sizing. Honored only when this builder
        # launches the JVM; a driver that brings its own session keeps
        # its own heap.
        .config("spark.driver.memory", "10g")
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
