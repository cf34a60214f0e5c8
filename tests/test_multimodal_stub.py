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


def test_ppm_decode_roundtrip_and_golden():
    import numpy as np

    from opentelemetry_collector_spark.operators.multimodal import decode_ppm, synth_ppm

    w, h, px = decode_ppm(synth_ppm(b"abc", width=2, height=2))
    assert (w, h) == (2, 2)
    # body cycles 'abc' over 12 bytes: 97 98 99 97 98 99 ...
    assert px.reshape(-1).tolist() == [97, 98, 99] * 4
    # P3 ASCII variant and comment lines parse identically
    p3 = b"P3\n# a comment\n2 1\n255\n1 2 3 4 5 6"
    w3, h3, px3 = decode_ppm(p3)
    assert (w3, h3) == (2, 1) and px3.reshape(-1).tolist() == [1, 2, 3, 4, 5, 6]
    assert np.array_equal(decode_ppm(synth_ppm(b""))[2], np.zeros((4, 8, 3)))


def test_bmp_decode_bottom_up_padding_and_bgr():
    import struct

    from opentelemetry_collector_spark.operators.multimodal import decode_bmp

    # hand-built 2x2 24-bit BMP: stride pads 6 bytes to 8; bottom-up rows;
    # BGR order. Pixels (RGB): top row [(1,2,3),(4,5,6)], bottom [(7,8,9),(10,11,12)]
    rows_bottom_up = [
        bytes([9, 8, 7, 12, 11, 10, 0, 0]),  # bottom row first, BGR + pad
        bytes([3, 2, 1, 6, 5, 4, 0, 0]),
    ]
    data = b"".join(rows_bottom_up)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
    w, h, px = decode_bmp(header + info + data)
    assert (w, h) == (2, 2)
    assert px[0].reshape(-1).tolist() == [1, 2, 3, 4, 5, 6]
    assert px[1].reshape(-1).tolist() == [7, 8, 9, 10, 11, 12]


def test_wav_decode_roundtrip_signed_samples():
    from opentelemetry_collector_spark.operators.multimodal import decode_wav, synth_wav

    rate, samples = decode_wav(synth_wav(b"\x00\x80\xff\x7f", n_samples=4, sample_rate=8000))
    assert rate == 8000
    # bytes cycle: (0x00,0x80)=-32768, (0xff,0x7f)=32767, repeating
    assert samples.tolist() == [-32768, 32767, -32768, 32767]


def test_resize_real_ppm_nearest_neighbor(spark):
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.multimodal import (
        decode_ppm,
        resize,
        synth_ppm,
        wrap_binary,
    )

    src = spark.createDataFrame([(1, synth_ppm(b"xyz"))], "doc_id long, p binary")
    media = wrap_binary(src, "doc_id", "p", modality="image", mime="image/x-portable-pixmap")
    out = resize(media, width=4, height=2, decode_stub=False).collect()[0]
    w, h, px = decode_ppm(bytes(out["payload"]))
    assert (w, h) == (4, 2) and out["meta"]["width"] == 4
    # nearest-neighbor of the deterministic source grid
    w0, h0, px0 = decode_ppm(synth_ppm(b"xyz"))
    assert px.tolist() == px0[[0, 2]][:, [0, 2, 4, 6]].tolist()


def test_extract_features_real_decode(spark):
    from opentelemetry_collector_spark.operators.multimodal import (
        extract_features,
        synth_ppm,
        synth_wav,
        wrap_binary,
    )

    src = spark.createDataFrame(
        [(0, synth_ppm(b"abc")), (1, synth_wav(b"abc"))], "doc_id long, p binary"
    )
    media = wrap_binary(src, "doc_id", "p", modality="image", mime="application/octet-stream")
    got = {r.media_id: r.features for r in extract_features(media, decode_stub=False).collect()}
    assert got[0][:2] == [8.0, 4.0]  # width, height lead the image features
    assert got[1][0] == 8000 / 1e5  # sample rate leads the audio features
