"""Span-dedup family under boilerplate skew — measured.

The worst realistic input for ExactSubstr span dedup is a
boilerplate-heavy corpus: ONE shared k-gram block (navigation header,
license banner, chat template) present in 50%+ of all documents. Each
boilerplate gram digest then occurs in n_docs/2 documents, so:

- the ``dup`` count-distinct agg in ``ops.dedup.span_excision`` sees a
  few digests with huge per-key occurrence lists (the round-5 AQE
  serial-reduce candidate: count_distinct expands to a (g, doc) partial
  agg whose keys never repeat, the partial agg bails out, and AQE sizes
  the raw-row reduce by BYTES);
- the ``hits`` join-back fans every hot digest out to half the corpus
  (linear — each doc holds its own positions — but concentrated);
- the per-doc island window inherits one hit row per boilerplate
  window per doc (bounded by doc length, never by corpus size).

This tool synthesizes that corpus deterministically (hash-derived
filler tokens, a fixed 16-token boilerplate block planted in a
configurable fraction of docs), runs the batch ``span_excision`` on a
skewed and a uniform control corpus, scrapes the Spark UI for 1-task
stages with outsized shuffle-read record counts (the pathology
signature), sanity-checks the span output against the closed form
(every hot doc must carry exactly one merged span of the block's
9 windows), and drives the STREAMING twin over the same skewed corpus
(base + 3 arrival batches) asserting exact equality with the batch
answer. Results land in SCALE.md ("Span family under boilerplate
skew").

Usage::

    python tools/span_skew_smoke.py [n_docs] [boiler_frac] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

K = 8
BLOCK_TOKENS = 16  # boilerplate block length -> BLOCK_TOKENS - K + 1 windows
FILLER_TOKENS = 40


def synth_corpus(
    spark: SparkSession, n_docs: int, boiler_frac: float
) -> DataFrame:
    """Deterministic corpus: every doc gets FILLER_TOKENS unique
    hash-derived tokens (collision-free across docs by construction —
    each token embeds the doc id); docs with hash(id) in the hot
    fraction get the SAME 16-token boilerplate block appended. No RNG,
    rerun-stable, generated in 32 partitions with zero shuffle."""
    block = " ".join(f"boiler{i:02d}" for i in range(BLOCK_TOKENS))
    filler = (
        f"array_join(transform(sequence(1, {FILLER_TOKENS}), "
        f"i -> concat('t', id, 'x', i)), ' ')"
    )
    return spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.abs(F.xxhash64("id")) % 1000) < int(boiler_frac * 1000),
            F.concat(F.expr(filler), F.lit(" " + block)),
        )
        .otherwise(F.expr(filler))
        .alias("text"),
    )


def ui_one_task_stages(base: str, app: str) -> list[dict]:
    """Completed 1-task stages with their shuffle-read volumes."""
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return [
        {
            "stage": s["stageId"],
            "tasks": s["numCompleteTasks"],
            "shuffle_read_records": s["shuffleReadRecords"],
            "shuffle_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
            "exec_run_s": round(s["executorRunTime"] / 1e3, 2),
        }
        for s in stages
        if s["numCompleteTasks"] == 1 and s["shuffleReadRecords"] > 0
    ]


def run_batch(spark: SparkSession, docs: DataFrame, label: str) -> dict:
    from osmart_etl_spark.ops.dedup import span_excision

    docs = docs.persist()
    docs.count()  # isolate synthesis cost from the measured op
    t0 = time.time()
    spans = span_excision(docs, "doc_id", "text", K)
    agg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("tot_len"),
        F.count_distinct("doc_id").alias("n_docs"),
    ).collect()[0]
    wall = time.time() - t0
    docs.unpersist()
    return {
        "label": label,
        "wall_s": round(wall, 2),
        "n_spans": agg["n_spans"],
        "tot_len": agg["tot_len"],
        "n_docs_with_spans": agg["n_docs"],
    }


def run_stream(spark: SparkSession, docs: DataFrame, tmp: str) -> dict:
    """Streaming twin on the skewed corpus: 25% immutable base, the
    rest arriving in 3 file-batches; asserts consolidated streamed
    spans == batch spans restricted to streamed docs."""
    from osmart_etl_spark.ops.dedup import span_excision
    from osmart_etl_spark.streaming.span_stream import run_span_dedup_stream

    base = docs.filter(F.col("doc_id") % 4 == 0)
    new = docs.filter(F.col("doc_id") % 4 != 0)
    src = os.path.join(tmp, "arrivals")
    for b in range(3):
        new.filter(F.col("doc_id") % 3 == b).write.parquet(f"{src}/f{b}")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    t0 = time.time()
    got_df = run_span_dedup_stream(
        spark, stream, base, os.path.join(tmp, "work"), k=K
    ).persist()
    got_agg = got_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("span_len").alias("s")
    ).collect()[0]
    wall = time.time() - t0
    want_df = span_excision(docs, "doc_id", "text", K).filter(
        F.col("doc_id") % 4 != 0
    )
    mism = got_df.exceptAll(want_df).count() + want_df.exceptAll(got_df).count()
    got_df.unpersist()
    return {
        "wall_s": round(wall, 2),
        "n_spans": got_agg["n"],
        "tot_len": got_agg["s"],
        "mismatch_rows_vs_batch": mism,
    }


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    boiler_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    out_json = sys.argv[3] if len(sys.argv) > 3 else None

    from osmart_etl_spark.session import get_spark

    spark = get_spark(
        "span-skew-smoke",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4064"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    uniform = run_batch(spark, synth_corpus(spark, n_docs, 0.0), "uniform")
    skewed = run_batch(
        spark, synth_corpus(spark, n_docs, boiler_frac), f"boiler{boiler_frac}"
    )

    # closed form for the skewed corpus: every hot doc carries exactly
    # one merged span covering the block's 9 windows (filler tokens are
    # globally unique, so nothing else can be duplicated)
    n_hot = (
        synth_corpus(spark, n_docs, boiler_frac)
        .filter(F.col("text").contains("boiler00"))
        .count()
    )
    expect_windows = BLOCK_TOKENS - K + 1
    shape_ok = (
        skewed["n_spans"] == n_hot
        and skewed["n_docs_with_spans"] == n_hot
        and skewed["tot_len"] == n_hot * (expect_windows - 1 + K)
        and uniform["n_spans"] == 0
    )

    one_task = sorted(
        ui_one_task_stages(spark.sparkContext.uiWebUrl, spark.sparkContext.applicationId),
        key=lambda s: -s["shuffle_read_records"],
    )[:5]

    tmp = tempfile.mkdtemp(prefix="span_skew_")
    try:
        stream = run_stream(spark, synth_corpus(spark, n_docs, boiler_frac), tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "n_docs": n_docs,
        "boiler_frac": boiler_frac,
        "n_hot_docs": n_hot,
        "uniform": uniform,
        "skewed": skewed,
        "shape_ok": shape_ok,
        "skew_ratio": round(skewed["wall_s"] / max(uniform["wall_s"], 1e-9), 2),
        "worst_1task_stages": one_task,
        "stream": stream,
        "stream_ok": stream["mismatch_rows_vs_batch"] == 0,
    }
    print(json.dumps(out, indent=2))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=2)
    return 0 if (shape_ok and out["stream_ok"]) else 1


if __name__ == "__main__":
    sys.exit(main())
