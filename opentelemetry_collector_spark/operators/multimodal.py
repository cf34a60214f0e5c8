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

    Real pipeline would decode `payload` per modality; the stub computes
    deterministic byte-histogram moments so downstream stages (ANN over the
    feature column, dedup by feature hash) are fully exercisable.
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
                    raise NotImplementedError(
                        "real codec not available in this container; "
                        "plug PIL/soundfile/av decode here"
                    )
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
    stubbed (deterministic byte stride-sample sized to width*height) with
    the NotImplementedError marking where `PIL.Image.resize` would go.
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
                    raise NotImplementedError(
                        "real codec not available in this container; "
                        "plug PIL.Image.open(...).resize((w, h)) here"
                    )
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
