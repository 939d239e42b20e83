"""Text-analysis operators for training-data pipelines (BASELINE.json
extension surface): tokenization, quality scoring, language-ID heuristic,
document fingerprinting.

All built on JVM-side array/string expressions — no Python UDFs — so they
whole-stage-codegen and scale linearly with the scan. At 100 TB the text
column dominates I/O; every operator here is a single projection over one
scan (no shuffle at all until an aggregation is requested).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language marker lexicons for the n-gram/stopword language-ID
#: heuristic. Deliberately minimal — the operator contract is the shape
#: (argmax over per-language evidence counts), not lexicon quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "et", "des"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokenization, empty tokens dropped (array<string>)."""
    return F.filter(F.split(text, " "), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(F.filter(toks, lambda x: x.isin(*stopwords)))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, trimmed,
    whitespace collapsed."""
    return F.regexp_replace(F.lower(F.trim(text)), " +", " ")


def fingerprint(text: Column) -> Column:
    """Content fingerprint = md5 of the normalized text. md5 (not
    Spark's murmur ``hash``) so fingerprints are engine-portable."""
    return F.md5(normalized_text(text))


def lang_scores(toks: Column) -> dict[str, Column]:
    """Per-language marker-hit counts — the evidence vector for lang-ID."""
    return {
        lang: F.size(F.filter(toks, lambda x: x.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(toks: Column) -> Column:
    """Argmax over language scores; deterministic tie-break by the fixed
    language order (earlier wins); 'und' when no marker hits at all."""
    scores = lang_scores(toks)
    langs = list(scores)
    expr = F.lit("und")
    for lang in reversed(langs):
        is_max = F.lit(True)
        for o in langs:
            if o == lang:
                continue
            if langs.index(o) < langs.index(lang):
                is_max = is_max & (scores[lang] > scores[o])
            else:
                is_max = is_max & (scores[lang] >= scores[o])
        expr = F.when((scores[lang] > 0) & is_max, F.lit(lang)).otherwise(expr)
    return expr


def max_multiplicity(arr: Column) -> Column:
    """Highest multiplicity of any element in ``arr`` (0 for empty) —
    computed as the longest run in the SORTED array via one fold, so
    per-document mode-counting never needs an explode + two shuffles.
    Accumulator carries (prev element, current run, best run)."""
    sorted_arr = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
    )
    step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
        .otherwise(F.lit(1).cast("bigint"))
        .alias("run"),
        F.greatest(
            acc["best"],
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1).otherwise(
                F.lit(1).cast("bigint")
            ),
        ).alias("best"),
    )
    return F.aggregate(sorted_arr, init, step)["best"]


def bigrams(toks: Column) -> Column:
    """Adjacent token 2-grams as strings; empty for docs with <2 tokens."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 1, F.lit(0)))
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        )
    )


def bm25_top_terms(
    docs,
    doc_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 3,
    stopwords: tuple[str, ...] = STOPWORDS,
):
    """BM25 top-``top_n`` terms per document — the relevance/keyword
    extraction primitive of a training-data pipeline (salient-term
    indexing, query-doc scoring, near-topic sampling).

    Output: (doc, term, tf, df, rank) — integer evidence only. The BM25
    score itself is deliberately NOT emitted: it contains ``ln``, which
    libm vs JVM may round 1 ulp apart, so cross-engine comparison is done
    on the *ranking* the score induces (ties are impossible across
    distinct (tf, df, dl) triples except at ulp distance, and identical
    triples produce identical doubles within each engine; row_number
    tiebreaks on the term itself).

    Scale shape: explode → two partial-agg groupBys (tf by (doc, term),
    df by term) → join on term, join on doc, ONE window on doc. The
    corpus-wide scalars (N, total token count) ride a broadcast 1-row
    aggregate, never a driver round-trip. documents arrive as few files;
    the explode is repartitioned first (single-file gotcha).
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    from osmart_etl_spark.io.sources import default_parallelism

    n_parts = default_parallelism(spark)
    toks = (
        docs.repartition(n_parts)
        .select(F.col(doc_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(~F.col("term").isin(*stopwords))
    )
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl"))

    scored = tf.join(dfreq, "term").join(dl, "doc").crossJoin(F.broadcast(stats))
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    score = (idf * (F.col("tf") * F.lit(k1 + 1.0))) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    w = Window.partitionBy("doc").orderBy(F.col("__score").desc(), "term")
    return (
        scored.withColumn("__score", score)
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= top_n)
        .select(
            F.col("doc").alias(doc_col),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            "rnk",
        )
    )
