"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard (BASELINE.json extension surface).

Scale design
------------
- **Exact**: hash-groupBy on a content fingerprint — one shuffle keyed by
  a 128-bit digest; no skew (digests are uniform).
- **MinHash+LSH**: shingle → K minhashes → B bands of R rows →
  candidate pairs join only within band buckets. The full O(n²) pair
  space is never materialized; cost is O(Σ bucket²) which LSH keeps tiny.
  This is the standard shingle→minhash→band→bucket-join pipeline
  (Broder '97 / MMDS ch.3) expressed relationally.
- **Verification**: exact n-gram Jaccard computed ONLY for LSH candidate
  pairs.
- **Portability**: all hashing goes through md5 (engine-portable,
  deterministic) rather than Spark's murmur ``hash``, so results are
  reproducible across engines and runs; minhash compares md5 hex strings
  lexicographically (uniform in the keyspace), which is rank-equivalent
  to comparing the underlying 128-bit integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmart_etl_spark.ops.text import normalized_text


def char_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Distinct character k-gram shingles per document, over normalized
    text. Output: (id, shingle). Short docs (<k chars) yield their whole
    text as the single shingle.

    Shape notes (measured 18s → ~2s at sf0.1): documents often arrive as
    one file = one partition, so the explode is repartitioned first to
    use every core; shingling happens inside ``transform`` over the index
    array with per-doc ``array_distinct`` BEFORE the explode, so the
    exploded rows carry only (id, 5-char shingle) — never the full
    document text — and the global distinct shuffles the minimum.
    """
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    norm = normalized_text(F.col(text_col))
    base = df.repartition(n_parts).select(F.col(id_col), norm.alias("__norm"))
    idx = F.sequence(F.lit(1), F.greatest(F.length("__norm") - (k - 1), F.lit(1)))
    shingle_arr = F.array_distinct(
        F.transform(idx, lambda i: F.col("__norm").substr(i, F.lit(k)))
    )
    # No global .distinct(): per-doc array_distinct already makes
    # (id, shingle) unique, so the output is shuffle-free — a pure map.
    return base.select(F.col(id_col), F.explode(shingle_arr).alias("shingle"))


#: Universal-hash family constants (a_k odd, deterministic) and prime
#: modulus for minhash — h_k(x) = (a_k·x + b_k) mod P, the textbook
#: construction (Carter-Wegman; MMDS ch.3). P < 2^31 and base hash
#: x < 2^28 keep every product below 2^63: no bigint overflow in either
#: engine (Spark wraps silently, DuckDB errors — neither is hit).
MINHASH_P = 1_000_000_007


def _minhash_seed(k: int) -> tuple[int, int]:
    return 2 * k + 1 + 104_729 * k, 12_289 * k + 31


def base_shingle_hash(col):
    """Engine-portable 28-bit base hash: first 7 hex chars of md5."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def minhash_signatures(shingles: DataFrame, id_col: str, num_hashes: int = 16) -> DataFrame:
    """K independent minhashes per doc via a universal hash family over
    ONE md5-derived base hash per shingle: signature_k = MIN over the
    doc's shingles of (a_k·h + b_k) mod P. Output: (id, k, minhash).

    Computed WIDE: one groupBy(id) evaluating all K min-aggregates
    map-side, then unpivoted with ``stack`` (no shuffle). Two measured
    pitfalls shaped this: exploding K seed rows per shingle shuffles K×
    the shingle table (~10× slower at sf0.1), and hashing md5(k||s) per
    seed costs K full digests where the universal family needs one.
    """
    h = base_shingle_hash(F.col("shingle"))
    base = shingles.select(F.col(id_col), h.alias("__h"))
    aggs = []
    for k in range(num_hashes):
        a, b = _minhash_seed(k)
        aggs.append(
            F.min((F.col("__h") * a + b) % MINHASH_P).alias(f"mh{k}")
        )
    wide = base.groupBy(id_col).agg(*aggs)
    stack_args = ", ".join(f"{k}, mh{k}" for k in range(num_hashes))
    return wide.selectExpr(
        id_col, f"stack({num_hashes}, {stack_args}) AS (k, minhash)"
    )


def lsh_band_keys(signatures: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Group the K signature rows into bands of R; band key = ordered
    concat of the band's minhashes. Output: (id, band, band_key)."""
    # floor division — a plain double-division cast would TRUNCATE in
    # Spark but ROUND in DuckDB's double→int cast; floor is unambiguous.
    banded = signatures.withColumn("band", F.floor(F.col("k") / rows_per_band).cast("int"))
    return banded.groupBy(id_col, "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("k", "minhash"))),
                lambda s: s["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )


def candidate_pairs(band_keys: DataFrame, id_col: str) -> DataFrame:
    """Docs sharing any band bucket → distinct (id_a < id_b) pairs.
    The join shuffles on (band, band_key) — bucket-local, never all-pairs."""
    # Self-join: persist so the upstream signature DAG runs once, not twice.
    band_keys = band_keys.persist()
    a = band_keys.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_a")
    )
    b = band_keys.select(
        F.col("band"), F.col("band_key"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    shingles: DataFrame, pairs: DataFrame, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs only.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|); bigint counts, so the double
    division is bit-deterministic. Output: (id_a, id_b, jaccard)."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    sa = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("n_b"))
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a", "id_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash60(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """60-bit SimHash over whitespace tokens.

    Token hash = first 15 hex chars of md5 (60 bits — fits a signed
    long in both engines); bit b of the fingerprint is the sign of
    Σ_tokens (2·bit_b(h) − 1). Output: (id, simhash bigint).

    Implementation is one explode (tokens × 60 bits) + groupBy — heavy
    but linear; for production scale, prefer the per-bit popcount over
    64-bit words in a pandas_udf. Near-dup pairing over simhash uses
    band-rotation buckets, not materialized here.
    """
    from osmart_etl_spark.ops.text import tokens

    n_parts = df.sparkSession.sparkContext.defaultParallelism
    toks = df.repartition(n_parts).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("bigint")
    bits = toks.select(
        F.col(id_col), h.alias("h"), F.explode(F.sequence(F.lit(0), F.lit(59))).alias("b")
    )
    # Bit test via power-of-two mask (2^b is exact in double for b<=59);
    # shiftright's numBits must be a literal in Spark, hence the mask form.
    mask = F.pow(F.lit(2.0), F.col("b")).cast("bigint")
    contrib = bits.select(
        F.col(id_col), "b",
        (F.when(F.col("h").bitwiseAND(mask) != 0, 1).otherwise(0) * 2 - 1).alias("c"),
    )
    bit_votes = contrib.groupBy(id_col, "b").agg(F.sum("c").alias("v"))
    return bit_votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("v") > 0, F.pow(F.lit(2.0), F.col("b")).cast("bigint")).otherwise(F.lit(0))
        ).alias("simhash")
    )
