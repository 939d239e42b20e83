"""Multimodal plumbing tests: schema, Arrow batch shape, stub decoders,
failure capture (ops/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_extract_features_plumbing(spark):
    from osmart_etl_spark.ops.multimodal import extract_features, make_synthetic_media

    media = make_synthetic_media(spark, n=30).repartition(4)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    by_status = {}
    for r in rows:
        by_status.setdefault(r["decode_status"], []).append(r)
    # image + audio decode via deterministic fakes; video hits the stub
    assert len(by_status["ok"]) == 20
    assert len(by_status["stub_not_implemented"]) == 10
    img = next(r for r in by_status["ok"] if r["media_type"] == "image")
    assert len(img["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in img["feature"])
    # determinism across runs (same payload → same feature)
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert rows2[img["media_id"]] == img["feature"]


def test_media_stats_no_decode(spark):
    from osmart_etl_spark.ops.multimodal import make_synthetic_media, media_stats

    media = make_synthetic_media(spark, n=30)
    stats = {r["media_type"]: r for r in media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["image"]["n_items"] == 10
    assert stats["image"]["total_bytes"] == 10 * 128
