"""Corpus-cleaning operators for training-data pipelines: PII
detection/redaction and paragraph-level exact dedup (the C4/RefinedWeb
"remove any repeated substring unit corpus-wide, keep the first copy"
rule, at token-window granularity).

Both operators are pure DataFrame compositions — regex/string/array
expressions stay JVM-side in whole-stage codegen; the dedup's only
shuffles are one hash-aggregate on the unit digest, the digest join
back, and the per-doc reassembly aggregate. Unit digests are md5 so
keys distribute uniformly at any corpus size; a unit repeated millions
of times (boilerplate at 100 TB) concentrates its *occurrence rows* on
one digest key, which AQE skew-join splitting handles because the
heavy side arrives via a join, not a window sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osmart_etl_spark.ops.text import tokens

#: Engine-portable regexes (same semantics under Java regex and RE2):
#: character classes, bounded repetition, no lookaround, no backrefs.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{4}-[0-9]{4}"

#: Position encoding for "first occurrence wins": doc_id * 1_000_000 +
#: unit index. Valid while every doc has < 1e6 units (16M tokens at
#: K=16) and doc_id < ~9.2e12 — true for any real corpus; a generic
#: engine would min_by a (doc_id, unit_idx) struct instead, at the cost
#: of a wider shuffle row.
POS_BASE = 1_000_000


def count_matches(text: Column, pattern: str) -> Column:
    """Number of non-overlapping matches (0 when none) — bigint."""
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def redact(text: Column, pattern: str, token: str) -> Column:
    """Replace every match of ``pattern`` with ``token``.

    Spark's regexp_replace is global by default; the DuckDB oracle twin
    must pass the explicit 'g' flag to match.
    """
    return F.regexp_replace(text, pattern, token)


def unit_explode(docs: DataFrame, k: int) -> DataFrame:
    """Split each doc into consecutive ≤k-token units (the "paragraph"
    granularity for synthetic single-line docs): (doc_id, u_idx,
    u_text). Pure flatMap off the per-doc token array — no shuffle."""
    base = docs.select("doc_id", tokens(F.col("text")).alias("t")).filter(
        F.size("t") > 0
    )
    idx = F.sequence(F.lit(0), F.floor((F.size("t") - 1) / k).cast("int"))
    sl = F.slice(F.col("t"), F.col("u_idx") * k + 1, k)
    return (
        base.select("doc_id", "t", F.explode(idx).alias("u_idx"))
        .select(
            "doc_id",
            F.col("u_idx").cast("bigint").alias("u_idx"),
            F.array_join(sl, " ").alias("u_text"),
        )
    )


def dedup_units_corpus_wide(units: DataFrame) -> DataFrame:
    """Keep exactly one copy (the first by (doc_id, u_idx)) of every
    distinct unit text across the whole corpus.

    Aggregate-then-join rather than a row_number window over the digest
    partition: the aggregate is map-side combinable (each input
    partition contributes at most one candidate per digest before the
    shuffle), so the exchange moves |distinct units| rows instead of
    |occurrences| — the difference between fine and catastrophic when
    one boilerplate unit appears 10^8 times at 100 TB.
    """
    keyed = units.withColumn("h", F.md5("u_text")).withColumn(
        "pos", F.col("doc_id") * POS_BASE + F.col("u_idx")
    )
    firsts = keyed.groupBy("h").agg(F.min("pos").alias("first_pos"))
    return (
        keyed.join(firsts, "h")
        .filter(F.col("pos") == F.col("first_pos"))
        .select("doc_id", "u_idx", "u_text")
    )


def reassemble(kept: DataFrame) -> DataFrame:
    """Per-doc ordered reassembly of surviving units → (doc_id,
    kept_units, dedup_fp). Docs with zero surviving units are absent
    (callers LEFT JOIN totals to represent them)."""
    ordered = F.array_sort(F.collect_list(F.struct("u_idx", "u_text")))
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_units"),
        F.md5(
            F.array_join(F.transform(ordered, lambda s: s["u_text"]), " ")
        ).alias("dedup_fp"),
    )
