"""Boilerplate-skew smoke for paragraph-level corpus dedup.

SCALE.md claims the aggregate-then-join first-occurrence resolution is
skew-safe because the digest exchange carries |distinct units|, not
|occurrences|, and map-side partial MINs pre-collapse the hot digest.
This measures it: a synthetic corpus where every doc shares ONE
boilerplate unit (the C4 motivation — headers/footers repeated across
the whole crawl) vs a fully-unique corpus of identical size.

Usage: python tools/boilerplate_smoke.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from osmart_etl_spark.ops.cleaning import dedup_units_corpus_wide, reassemble
from osmart_etl_spark.session import get_spark

UNIT = 16


def make_corpus(spark, n_docs: int, boilerplate: bool):
    """3 units per doc; middle unit is either globally constant
    (boilerplate → one digest with n_docs occurrences) or unique."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    uniq = lambda tag: F.concat_ws(  # noqa: E731
        " ",
        *[
            F.concat(F.lit(f"{tag}{k}_"), F.col("doc_id").cast("string"))
            for k in range(UNIT)
        ],
    )
    mid = (
        F.lit(" ".join(f"boiler{k}" for k in range(UNIT)))
        if boilerplate
        else uniq("m")
    )
    return base.select(
        "doc_id",
        F.concat_ws(" ", uniq("a"), mid, uniq("z")).alias("text"),
    )


def run(spark, n_docs: int, boilerplate: bool) -> tuple[float, int]:
    from osmart_etl_spark.ops.cleaning import unit_explode

    docs = make_corpus(spark, n_docs, boilerplate)
    t0 = time.time()
    kept = reassemble(dedup_units_corpus_wide(unit_explode(docs, UNIT)))
    n = kept.count()
    return time.time() - t0, n


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for label, flag in (("uniform", False), ("boilerplate", True)):
        # warm + measured run (JVM/codegen warmup dominates cold runs)
        run(spark, n_docs // 10, flag)
        dt, n = run(spark, n_docs, flag)
        print(f"{label:12s} n_docs={n_docs} kept_docs={n} wall={dt:.1f}s")


if __name__ == "__main__":
    main()
