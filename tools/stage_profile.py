"""Per-job/stage wall-clock profiler for registry queries — the tool
that found the round-5 AQE single-task-reduce pathology.

Runs a query once to warm caches/JIT, then re-runs it against the
Spark UI REST API and prints every job >0.5 s with its stages' task
counts, shuffle-read bytes/records, and executor time. A 1-task stage
with millions of shuffle-read records is the signature of AQE
coalescing a CPU-heavy reduce by byte size (fix: numbered repartition
on the grouping keys under the agg — see SCALE.md round 5).

Usage:
    python tools/stage_profile.py setsim_exact_join [sf_dir]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from osmart_etl_spark.queries.base import REGISTRY
    from osmart_etl_spark.session import get_spark

    spark = get_spark(
        "stage-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4063"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if name not in REGISTRY:
        print(f"unknown query {name!r}")
        return 2

    REGISTRY[name].fn(spark, sf_dir).count()  # warm
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def get(path: str):
        return json.load(urllib.request.urlopen(f"{base}/api/v1/applications/{app}/{path}"))

    seen = {j["jobId"] for j in get("jobs")}
    t0 = time.time()
    n = REGISTRY[name].fn(spark, sf_dir).count()
    print(f"{name}: {time.time() - t0:.2f}s warm, {n} rows")

    jobs = [j for j in get("jobs") if j["jobId"] not in seen]
    stages = {s["stageId"]: s for s in get("stages")}

    def ts(x: str) -> datetime.datetime:
        return datetime.datetime.strptime(x, "%Y-%m-%dT%H:%M:%S.%fGMT")

    def dur(s: dict) -> float:
        try:
            return (ts(s["completionTime"]) - ts(s["submissionTime"])).total_seconds()
        except (KeyError, ValueError):
            return -1.0

    t00 = min(ts(j["submissionTime"]) for j in jobs)
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        a = (ts(j["submissionTime"]) - t00).total_seconds()
        b = (ts(j["completionTime"]) - t00).total_seconds() if "completionTime" in j else -1
        if b - a < 0.5:
            continue
        st = [
            (
                sid,
                stages[sid]["numCompleteTasks"],
                round(dur(stages[sid]), 2),
                stages[sid].get("shuffleReadBytes"),
                stages[sid].get("shuffleReadRecords"),
                stages[sid].get("executorRunTime"),
            )
            for sid in j.get("stageIds", [])
            if sid in stages and stages[sid]["status"] == "COMPLETE"
        ]
        print(
            f"JOB {j['jobId']:4d} [{a:6.2f}->{b:6.2f}] {b - a:5.2f}s "
            f"(stage, tasks, wall_s, shR_bytes, shR_recs, exec_ms): {st}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
