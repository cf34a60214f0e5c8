"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as `binary` columns with a metadata struct
(modality, mime, width/height/duration...). The Spark-side plumbing —
schema, partition sizing, Arrow batch shape, UDF signatures — is real and
tested; the actual codec step is STUBBED (decode libs are not in this
container): `decode_stub=True` produces a deterministic fake feature vector
(byte histogram moments), `decode_stub=False` raises NotImplementedError at
the exact point a real `PIL.Image.open` / `soundfile.read` call would go.

Scale notes: binary payloads dominate row size, so feature extraction uses
mapInPandas (streaming Arrow batches, bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch) and should run AFTER any
filter that can prune rows — never before.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.session import spread
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("modality", T.StringType(), False),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def wrap_binary(df: DataFrame, id_col: str, bytes_col: str, modality: str, mime: str) -> DataFrame:
    """Adapt any (id, binary) pair onto the MEDIA_SCHEMA envelope."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(bytes_col).alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: byte length + content hash, no decode."""
    return df.select(
        "media_id",
        F.col("meta.modality").alias("modality"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.sha1("payload").alias("content_sha1"),
    )


def extract_features(
    df: DataFrame, n_features: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    ``decode_stub=True`` computes deterministic byte-histogram moments so
    downstream stages (ANN over the feature column, dedup by feature hash)
    are fully exercisable without decoding. ``decode_stub=False`` REALLY
    decodes via the pure-Python codecs below (P6/P3 PPM, 24-bit BMP, PCM16
    WAV): images feature as [width, height, mean_r, mean_g, mean_b]/255
    padded to n_features, audio as [rate/1e5, duration_s, mean_abs/2^15];
    an unrecognized magic raises at this seam, where a PIL/soundfile/av
    decode would plug in for codec formats.
    """
    schema = "media_id long, modality string, features array<double>"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                if not decode_stub:
                    b = bytes(payload)
                    if b.startswith((b"P6", b"P3")):
                        w, h, px = decode_ppm(b)
                        f = [float(w), float(h)] + list(px.mean(axis=(0, 1)) / 255.0)
                    elif b.startswith(b"BM"):
                        w, h, px = decode_bmp(b)
                        f = [float(w), float(h)] + list(px.mean(axis=(0, 1)) / 255.0)
                    elif b[:4] == b"RIFF":
                        rate, samples = decode_wav(b)
                        f = [
                            rate / 1e5,
                            len(samples) / rate if rate else 0.0,
                            float(np.abs(samples.astype(np.int64)).mean() / 32768.0)
                            if len(samples)
                            else 0.0,
                        ]
                    else:
                        raise NotImplementedError(
                            "no pure-Python codec for this magic; plug "
                            "PIL/soundfile/av decode here"
                        )
                    feats.append((f + [0.0] * n_features)[:n_features])
                    continue
                a = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(a % n_features, minlength=n_features).astype(np.float64)
                total = hist.sum() or 1.0
                feats.append(list(hist / total))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [m["modality"] if m is not None else None for m in pdf["meta"]],
                    "features": feats,
                }
            )

    return spread(df).mapInPandas(gen, schema=schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Video frame-sampling analog: slice the payload at fixed strides.

    JVM-side substring on binary (no Python): stand-in for keyframe
    extraction; demonstrates the exploded one-row-per-frame output shape
    with the frame's byte slice carried along (what a real keyframe decoder
    would hand to the per-frame feature stage).
    """
    idx = F.sequence(
        F.lit(0),
        F.least(F.floor(F.octet_length("payload") / every_n_bytes), F.lit(max_frames - 1)),
    )
    out = df.withColumn("frame_idx", F.explode(idx))
    return out.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        # 1-based substring start; binary slices stay JVM-side
        F.substring(
            F.col("payload"), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
        ).alias("frame_bytes"),
    )


def resize(df: DataFrame, width: int, height: int, decode_stub: bool = True) -> DataFrame:
    """Image-resize analog via mapInPandas: payload -> resized payload with
    updated meta (width/height). The Arrow plumbing — binary in, binary out,
    nested meta rebuild, bounded batches — is real; the pixel work is
    stubbed (deterministic byte stride-sample sized to width*height) by
    default; ``decode_stub=False`` REALLY resizes P6 PPM payloads
    (nearest-neighbor over the decoded pixel grid, re-encoded as P6) and
    raises for other magics, where `PIL.Image.resize` would go.
    """
    out_schema = MEDIA_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            payloads = []
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                new_meta = dict(meta) if meta is not None else {"modality": None, "mime": None}
                new_meta["width"], new_meta["height"] = width, height
                metas.append(new_meta)
                if payload is None:
                    payloads.append(None)
                    continue
                if not decode_stub:
                    b = bytes(payload)
                    if not b.startswith(b"P6"):
                        raise NotImplementedError(
                            "no pure-Python resize for this magic; plug "
                            "PIL.Image.open(...).resize((w, h)) here"
                        )
                    w0, h0, px = decode_ppm(b)
                    ys = (np.arange(height, dtype=np.int64) * h0) // height
                    xs = (np.arange(width, dtype=np.int64) * w0) // width
                    out = px[ys][:, xs]
                    payloads.append(
                        b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()
                    )
                    continue
                a = np.frombuffer(payload, dtype=np.uint8)
                if len(a) == 0:
                    payloads.append(b"")
                    continue
                # deterministic stride re-sample to exactly target bytes
                pos = (np.arange(target, dtype=np.int64) * len(a)) // target
                payloads.append(a[pos].tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "meta": metas}
            )

    return spread(df).mapInPandas(gen, schema=out_schema)


def feature_histogram(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Integer byte-histogram features, flattened to one row per bucket.

    The oracle-checkable form of :func:`extract_features` (same decode-stub
    feature definition, integer counts instead of normalized doubles so the
    cross-engine value hash is exact). Output: (media_id, pos, cnt).
    """
    schema = "media_id long, pos int, cnt long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, poss, cnts = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                a = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(a % n_features, minlength=n_features)
                ids += [media_id] * n_features
                poss += list(range(n_features))
                cnts += hist.tolist()
            yield pd.DataFrame({"media_id": ids, "pos": poss, "cnt": cnts})

    return spread(df).mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Real codecs (pure Python, no native deps): PPM + BMP images, WAV audio.
#
# The container has no PIL/soundfile, but these three formats are fully
# specified byte layouts a from-scratch parser covers exactly — which turns
# the decode seam from a stub into a working path while keeping results
# deterministic enough for golden tests AND for the driver's DuckDB oracle
# (q179 synthesizes payloads from document text, so the oracle can compute
# the expected decoded integers straight from the text code points).
# Formats that genuinely need native codecs (JPEG/MP3/H.264) still raise
# at the same seam.
# ---------------------------------------------------------------------------

import struct


def synth_ppm(data: bytes, width: int = 8, height: int = 4) -> bytes:
    """Deterministic P6 PPM whose pixel bytes cycle through ``data``
    (zeros when empty) — the fixture generator for the decode path."""
    n = width * height * 3
    if data:
        reps = (n + len(data) - 1) // len(data)
        body = (data * reps)[:n]
    else:
        body = bytes(n)
    return b"P6\n%d %d\n255\n" % (width, height) + body


def synth_wav(data: bytes, n_samples: int = 48, sample_rate: int = 8000) -> bytes:
    """Deterministic PCM16 mono WAV whose sample bytes cycle through
    ``data`` (zeros when empty)."""
    n = n_samples * 2
    if data:
        reps = (n + len(data) - 1) // len(data)
        body = (data * reps)[:n]
    else:
        body = bytes(n)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + n, b"WAVE", b"fmt ", 16, 1, 1,
        sample_rate, sample_rate * 2, 2, 16, b"data", n,
    )
    return hdr + body


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, uint8 pixel array HxWx3) from P6/P3 PPM."""
    if not payload.startswith((b"P6", b"P3")):
        raise ValueError("not a PPM payload")
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(payload[start:pos])
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # single whitespace after maxval
    if payload.startswith(b"P6"):
        body = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    else:  # P3: ASCII triplets
        body = np.array(payload[pos:].split()[: w * h * 3], dtype=np.uint8)
    return w, h, body.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, uint8 pixel array HxWx3, top-down RGB) from an
    uncompressed 24-bit BI_RGB BMP (BITMAPINFOHEADER) — rows are stored
    bottom-up and 4-byte padded, pixels BGR; both are undone here."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", payload, 14)[:3]
    h = struct.unpack_from("<i", payload, 22)[0]
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * stride
        rows.append(np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off))
    px = np.vstack(rows).reshape(h, w, 3)
    if bottom_up:
        px = px[::-1]
    return w, h, px[:, :, ::-1].copy()  # BGR -> RGB


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 sample array) from a PCM16 mono/stereo WAV;
    walks the RIFF chunk list (fmt may be followed by LIST etc.)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only PCM16 WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples[:: channels]  # first channel
    return rate, samples


DECODE_SCHEMA = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    "n_samples int, duration_ms int, n_vals bigint, sum_vals bigint, "
    "sum_r bigint, sum_g bigint, sum_b bigint, sum_abs bigint"
)


def decode_media(df: DataFrame) -> DataFrame:
    """REAL decode via mapInPandas: sniff the payload magic (P6/P3 PPM,
    BM BMP, RIFF/WAVE), parse it with the pure-Python codecs above, and
    emit typed metadata + exact integer moments (sums, not float means, so
    the row hash is engine-exact). Unknown magics and NULL payloads yield
    a row with kind NULL — per-row degradation, never a job kill."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in DECODE_SCHEMA.split(", ")]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                row = dict.fromkeys(cols)
                row["media_id"] = media_id
                if payload is not None:
                    try:
                        if payload.startswith((b"P6", b"P3")):
                            w, h, px = decode_ppm(bytes(payload))
                            row.update(
                                kind="ppm", width=w, height=h,
                                n_vals=int(px.size), sum_vals=int(px.sum(dtype=np.int64)),
                                sum_r=int(px[:, :, 0].sum(dtype=np.int64)),
                                sum_g=int(px[:, :, 1].sum(dtype=np.int64)),
                                sum_b=int(px[:, :, 2].sum(dtype=np.int64)),
                            )
                        elif payload.startswith(b"BM"):
                            w, h, px = decode_bmp(bytes(payload))
                            row.update(
                                kind="bmp", width=w, height=h,
                                n_vals=int(px.size), sum_vals=int(px.sum(dtype=np.int64)),
                                sum_r=int(px[:, :, 0].sum(dtype=np.int64)),
                                sum_g=int(px[:, :, 1].sum(dtype=np.int64)),
                                sum_b=int(px[:, :, 2].sum(dtype=np.int64)),
                            )
                        elif payload[:4] == b"RIFF":
                            rate, samples = decode_wav(bytes(payload))
                            s = samples.astype(np.int64)
                            row.update(
                                kind="wav", sample_rate=rate, n_samples=len(samples),
                                duration_ms=int(len(samples) * 1000 // rate) if rate else None,
                                n_vals=len(samples), sum_vals=int(s.sum()),
                                sum_abs=int(np.abs(s).sum()),
                            )
                    except ValueError:
                        pass  # unsupported variant: kind stays NULL
                for c in cols:
                    out[c].append(row[c])
            yield pd.DataFrame(out)

    return spread(df).mapInPandas(gen, schema=DECODE_SCHEMA)
