"""Multimodal decode-stub feature consistency (oracle-able integer form
vs normalized extract_features)."""

from __future__ import annotations

def test_feature_histogram_counts_match_extract_features(spark):
    """feature_histogram is the integer-count form of the extract_features
    stub: counts/total must equal the normalized feature vector."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.multimodal import (
        extract_features,
        feature_histogram,
        wrap_binary,
    )

    df = spark.createDataFrame([(1, "abcabc!"), (2, "")], "doc_id long, text string")
    media = wrap_binary(
        df.withColumn("b", F.encode("text", "UTF-8")), "doc_id", "b", "image", "x"
    )
    counts = {
        (r.media_id, r.pos): r.cnt for r in feature_histogram(media, 8).collect()
    }
    feats = {r.media_id: r.features for r in extract_features(media, 8).collect()}
    for mid, fv in feats.items():
        total = sum(counts[(mid, p)] for p in range(8)) or 1
        for p in range(8):
            assert abs(fv[p] - counts[(mid, p)] / total) < 1e-12
