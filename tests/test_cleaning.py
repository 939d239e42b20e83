"""Operator-level properties for the cleaning surface (pii_scrub,
paragraph_dedup) — parity vs DuckDB is covered by tools/check_parity;
these pin the *semantics* the oracle can't articulate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_pii_scrub_counts_and_redaction(spark):
    from osmart_etl_spark.ops.cleaning import EMAIL_RE, PHONE_RE, count_matches
    from osmart_etl_spark.queries.cleaning import pii_scrub

    res = pii_scrub(spark, SF_SMALL)
    rows = res.collect()
    assert rows, "corpus empty"
    for r in rows:
        assert r["n_emails"] == (1 if r["doc_id"] % 3 == 0 else 0)
        assert r["n_phones"] == (1 if r["doc_id"] % 5 == 0 else 0)
        assert r["has_pii"] == (r["doc_id"] % 3 == 0 or r["doc_id"] % 5 == 0)

    # Redaction completeness: re-detecting on the redacted text finds
    # nothing. Rebuild the redacted column (the query only ships its
    # fingerprint) and assert zero residual matches.
    from osmart_etl_spark.ops.cleaning import redact
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.cleaning import _aug_text

    d = read_table(spark, SF_SMALL, "documents")
    red = redact(redact(_aug_text(), EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>")
    residual = d.select(
        (count_matches(red, EMAIL_RE) + count_matches(red, PHONE_RE)).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert residual == 0


def test_paragraph_dedup_invariants(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.ops.cleaning import unit_explode
    from osmart_etl_spark.queries.cleaning import _UNIT, paragraph_dedup

    res = paragraph_dedup(spark, SF_SMALL).collect()
    assert res

    docs = read_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    units = unit_explode(docs, _UNIT)
    n_distinct = units.select("u_text").distinct().count()
    n_total = units.count()

    assert sum(r["kept_units"] for r in res) == n_distinct
    assert sum(r["n_units"] for r in res) == n_total
    for r in res:
        assert 0 <= r["kept_units"] <= r["n_units"]
        assert r["dropped_units"] == r["n_units"] - r["kept_units"]
        # a doc that kept nothing has no reassembled fingerprint
        assert (r["dedup_fp"] is None) == (r["kept_units"] == 0)


def test_paragraph_dedup_idempotent(spark):
    """Dedup of an already-deduped corpus is a no-op: feed the surviving
    units back through corpus-wide dedup and nothing further drops."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.ops.cleaning import dedup_units_corpus_wide, unit_explode
    from osmart_etl_spark.queries.cleaning import _UNIT

    docs = read_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    kept = dedup_units_corpus_wide(unit_explode(docs, _UNIT))
    again = dedup_units_corpus_wide(kept)
    assert again.count() == kept.count()


def test_url_domain_filter_verdicts(spark):
    from osmart_etl_spark.queries.cleaning import _BLOCKLIST, url_domain_filter

    rows = url_domain_filter(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r["doc_id"] % 4 == 0:
            assert r["domain"] == f"spam{r['doc_id'] % 7}.example"
            assert r["is_blocked"] == (r["domain"] in _BLOCKLIST)
        else:
            assert r["domain"] == ""  # regexp_extract no-match contract
            assert r["is_blocked"] is False


def test_token_freq_subsample_invariants(spark):
    from osmart_etl_spark.queries.cleaning import token_freq_subsample

    a = token_freq_subsample(spark, SF_SMALL).collect()
    assert a
    total_before = sum(r["n_before"] for r in a)
    total_after = sum(r["n_after"] for r in a)
    assert 0 < total_after < total_before  # thinning actually happened
    for r in a:
        assert 0 <= r["n_after"] <= r["n_before"]
        assert (r["kept_fp"] is None) == (r["n_after"] == 0)
    # content-addressed gate → rerun-identical
    b = token_freq_subsample(spark, SF_SMALL).collect()
    key = lambda rows: sorted((r["doc_id"], r["n_after"], r["kept_fp"]) for r in rows)  # noqa: E731
    assert key(a) == key(b)


def test_training_pipeline_chunks_consistent(spark):
    from osmart_etl_spark.queries.cleaning import _CHUNK, corpus_training_pipeline

    rows = corpus_training_pipeline(spark, SF_SMALL).collect()
    assert rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in by_doc.items():
        idxs = sorted(c["chunk_idx"] for c in chunks)
        assert idxs == list(range(len(chunks)))  # contiguous from 0
        for c in chunks:
            assert 1 <= c["n_chunk_tokens"] <= _CHUNK
            # only the last chunk may be short
            if c["chunk_idx"] < len(chunks) - 1:
                assert c["n_chunk_tokens"] == _CHUNK


# -- exact substring-span dedup (Lee et al. 2022 ExactSubstr) --------------


def test_span_excision_planted_duplicate_paragraph(spark):
    from osmart_etl_spark.ops.dedup import span_excision

    # 12-token paragraph planted in docs a and b at different offsets;
    # doc c shares nothing >= k=8 tokens with anyone.
    para = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    a = "pre1 pre2 pre3 " + para + " tail-a1 tail-a2"
    b = para + " tail-b1 tail-b2 tail-b3 tail-b4"
    c = "unique1 unique2 unique3 unique4 unique5 unique6 unique7 unique8 unique9 unique10"
    df = spark.createDataFrame(
        [("a", a), ("b", b), ("c", c)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in span_excision(df, "doc_id", "text", k=8).collect()}

    # only the two docs holding the planted paragraph get a span
    assert set(rows) == {"a", "b"}
    # doc a: paragraph occupies token positions 4..15 (1-based); the
    # duplicated 8-windows start at 4..8, so the merged span is
    # [4, 8+8) = [4, 16) — exactly the paragraph extent.
    assert rows["a"]["span_start"] == 4 and rows["a"]["span_end"] == 16
    assert rows["a"]["span_len"] == 12 and rows["a"]["n_windows"] == 5
    # doc b: paragraph at positions 1..12 -> span [1, 13)
    assert rows["b"]["span_start"] == 1 and rows["b"]["span_end"] == 13
    assert rows["b"]["span_len"] == 12 and rows["b"]["n_windows"] == 5


def test_span_excision_merges_adjacent_and_separate_spans(spark):
    from osmart_etl_spark.ops.dedup import span_excision

    # two distinct shared regions in one doc, separated by a long unique
    # gap -> must come out as TWO spans, not one.
    r1 = "one two three four five six seven eight"          # 8 tokens
    r2 = "nine ten eleven twelve thirteen fourteen fifteen sixteen"  # 8 tokens
    gap = " ".join(f"gapx{i}" for i in range(12))
    d1 = r1 + " " + gap + " " + r2
    d2 = r1 + " other filler words here now yes " + r2
    df = spark.createDataFrame([("d1", d1), ("d2", d2)], ["doc_id", "text"])
    out = span_excision(df, "doc_id", "text", k=8).collect()
    spans_d1 = sorted(
        [(r["span_start"], r["span_end"]) for r in out if r["doc_id"] == "d1"]
    )
    # r1 at positions 1..8 -> [1,9); r2 at 21..28 -> [21,29)
    assert spans_d1 == [(1, 9), (21, 29)]


def test_span_excision_no_duplicates_empty(spark):
    from osmart_etl_spark.ops.dedup import span_excision

    df = spark.createDataFrame(
        [("x", " ".join(f"tok{i}" for i in range(30)))], ["doc_id", "text"]
    )
    assert span_excision(df, "doc_id", "text", k=8).count() == 0


def test_span_excision_intra_planted_repetition(spark):
    from osmart_etl_spark.ops.dedup import span_excision_intra

    rep = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    # doc r: repeated block at positions 1..8, 15..22 and 23..30
    # (second and third repeats are adjacent -> ONE merged span)
    mid = "u1 u2 u3 u4 u5 u6"
    r = rep + " " + mid + " " + rep + " " + rep
    # doc c: no repetition
    c = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([("r", r), ("c", c)], ["doc_id", "text"])
    rows = [
        x.asDict() for x in span_excision_intra(df, "doc_id", "text", k=8).collect()
    ]
    assert all(x["doc_id"] == "r" for x in rows)
    spans = sorted((x["span_start"], x["span_end"]) for x in rows)
    # the FIRST occurrence (pos 1) is kept; the 8-gram at pos 15 and 23
    # repeats it, and pos 16..22 windows (straddling the two adjacent
    # copies) also recur at... only exact window repeats count: windows
    # starting 15 and 23 are the exact block; any other repeated window
    # merges into the same island if within k. Assert the island covers
    # the two later copies (tokens 15..30 -> [15, 31)) and NOT the first.
    assert len(spans) == 1
    s0, s1 = spans[0]
    assert s0 >= 15 and s1 == 31


def test_span_excision_intra_no_repeats_empty(spark):
    from osmart_etl_spark.ops.dedup import span_excision_intra

    df = spark.createDataFrame(
        [("x", " ".join(f"tok{i}" for i in range(40)))], ["doc_id", "text"]
    )
    assert span_excision_intra(df, "doc_id", "text", k=8).count() == 0


def test_span_excised_text_removes_planted_paragraph(spark):
    """End-to-end: the duplicated paragraph disappears from BOTH docs'
    cleaned text (positions differ per doc), unique docs untouched."""
    from osmart_etl_spark.ops.dedup import span_excision
    from pyspark.sql import functions as SF

    para = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    a = "pre1 pre2 " + para + " tail1"
    b = para + " other1 other2 other3"
    c = " ".join(f"u{i}" for i in range(15))
    df = spark.createDataFrame([("a", a), ("b", b), ("c", c)], ["doc_id", "text"])

    spans = (
        span_excision(df, "doc_id", "text", k=8)
        .groupBy("doc_id")
        .agg(SF.collect_list(SF.struct("span_start", "span_end")).alias("__sp"))
    )
    toks = SF.filter(SF.split(SF.col("text"), " "), lambda x: x != SF.lit(""))
    joined = df.select("doc_id", toks.alias("__t")).join(spans, "doc_id", "left")
    kept = SF.expr(
        "filter(__t, (x, i) -> NOT exists(coalesce(__sp, array()), "
        "s -> i + 1 >= s.span_start AND i + 1 < s.span_end))"
    )
    out = {
        r["doc_id"]: r["cleaned"]
        for r in joined.select(
            "doc_id", SF.array_join(kept, " ").alias("cleaned")
        ).collect()
    }
    assert out["a"] == "pre1 pre2 tail1"
    assert out["b"] == "other1 other2 other3"
    assert out["c"] == c


def test_html_extract_roundtrip_all_ok(spark):
    """Every doc must survive the build-page→extract roundtrip exactly
    (the in-development RE2-backreference divergence was caught by this
    boolean going false on the DuckDB side)."""
    from osmart_etl_spark.queries.base import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["html_extract_text"].fn(spark, SF_SMALL).collect()
    assert len(rows) > 0
    assert all(r.roundtrip_ok for r in rows)
    assert all("<" not in r.extracted and "track(" not in r.extracted for r in rows)


def test_warc_parse_envelope_verified(spark):
    from osmart_etl_spark.queries.base import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["warc_parse_records"].fn(spark, SF_SMALL).collect()
    n_docs = spark.read.parquet(SF_SMALL + "/documents.parquet").count()
    assert len(rows) == 2 * n_docs  # response + metadata per doc
    assert all(r.length_ok for r in rows)
    types = {r.doc_id: set() for r in rows}
    for r in rows:
        types[r.doc_id].add(r.rec_type)
        assert r.target_uri.startswith("https://example.org/")
    assert all(t == {"response", "metadata"} for t in types.values())


def test_warc_and_html_parsers_survive_malformed_input(spark):
    """Errors-as-data for the text parsers too (the codec-fuzz
    doctrine): truncated/malformed envelopes must yield empty/null
    fields or a false verification boolean — never an exception."""
    from pyspark.sql import functions as F

    blobs = [
        (1, "WARC/1.0\r\nWARC-Type: response\r\n"),             # no payload
        (2, "WARC/1.0\r\nGarbage-Header\r\n\r\nbody"),          # no fields
        (3, ""),                                                # empty
        (4, "WARC/1.0\r\nContent-Length: 999\r\n\r\nhi\r\n\r\n"),  # lying length
        (5, "no warc marker at all"),
    ]
    df = spark.createDataFrame(blobs, "doc_id bigint, rec string")
    parsed = df.select(
        "doc_id",
        F.regexp_extract("rec", r"WARC-Type: ([a-z]+)", 1).alias("rec_type"),
        F.regexp_extract("rec", r"Content-Length: ([0-9]+)", 1).alias("cl_raw"),
        (
            F.octet_length(
                F.regexp_extract("rec", r"(?s)\r\n\r\n(.*?)\r\n\r\n$", 1)
            )
            == F.regexp_extract("rec", r"Content-Length: ([0-9]+)", 1)
            .try_cast("bigint")
        ).alias("length_ok"),
    ).collect()
    by_id = {r.doc_id: r for r in parsed}
    assert by_id[1].rec_type == "response" and by_id[1].length_ok is None
    assert by_id[2].rec_type == "" and by_id[2].cl_raw == ""
    assert by_id[4].length_ok is False  # lying Content-Length detected
    assert by_id[5].rec_type == ""


def test_readability_matches_python_twin(spark):
    import re

    from osmart_etl_spark.queries.base import REGISTRY
    from tests.conftest import SF_SMALL

    got = {
        r.doc_id: r
        for r in REGISTRY["text_readability_score"].fn(spark, SF_SMALL).collect()
    }
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet").collect()
    for d in docs:
        norm = re.sub(" +", " ", d.text.lower().strip())
        n_words = len([w for w in norm.split(" ") if w])
        n_letters = len(re.sub(r"[^a-z0-9]", "", norm))
        n_sentences = max(
            len([s for s in re.split(r"[.!?]+", d.text) if s.strip()]), 1
        )
        r = got[d.doc_id]
        assert (r.n_words, r.n_letters, r.n_sentences) == (
            n_words, n_letters, n_sentences,
        )
        assert r.coleman_liau_grade == (
            0.0588 * (100.0 * n_letters / max(n_words, 1))
            - 0.296 * (100.0 * n_sentences / max(n_words, 1))
            - 15.8
        )
