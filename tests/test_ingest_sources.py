"""JSONL-with-quarantine and binaryFile ingest sources (the crawl
pipeline's entry edges)."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from osmart_etl_spark.io.sources import read_binary_files, read_jsonl

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)


def test_read_jsonl_splits_good_and_corrupt(spark, tmp_path):
    p = tmp_path / "shard.jsonl"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en"}',
        "this is not json at all",
        '{"doc_id": 2, "text": "hola", "lang": "es"}',
        '{"doc_id": 3, "text": "unterminated',
        '{"doc_id": 4, "text": null, "lang": "fr"}',  # valid: null field
        "",  # blank line: quarantine, NOT a phantom all-null row
        "   ",  # whitespace-only line: same
    ]
    p.write_text("\n".join(lines) + "\n")

    good, quarantine = read_jsonl(spark, str(p), DOC_SCHEMA)
    g = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    q = [r._corrupt_record for r in quarantine.collect()]

    assert g == {1: ("hello world", "en"), 2: ("hola", "es"), 4: (None, "fr")}
    assert sorted(q) == sorted(
        ["this is not json at all", '{"doc_id": 3, "text": "unterminated', "", "   "]
    )
    # nothing silently dropped: good + quarantine == input lines
    assert len(g) + len(q) == len(lines)


def test_read_binary_files_content_and_glob(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x89PNG\r\n\x1a\nfakepayload")
    (tmp_path / "b.bin").write_bytes(b"RIFFxxxxWAVE")
    (tmp_path / "skip.txt").write_text("not binary shard")

    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"].content).startswith(b"\x89PNG")
    assert rows["b.bin"].length == 12


def test_binary_files_feed_multimodal_decode(spark, tmp_path):
    """The ingest edge composes with the decoder surface: a real
    (generated in-test) PBM image read via binaryFile decodes ok."""
    from osmart_etl_spark.ops.imagefmt import decode_pnm

    pbm = b"P1\n3 2\n1 0 1\n0 1 0\n"
    (tmp_path / "img.pbm").write_bytes(pbm)
    df = read_binary_files(spark, str(tmp_path), glob="*.pbm")
    content = bytes(df.collect()[0].content)
    img = decode_pnm(content)
    assert img.shape[:2] == (2, 3)
