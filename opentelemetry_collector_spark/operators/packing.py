"""Sequence packing: greedy chunking of ordered turns into context windows.

A training pipeline over transcripts packs consecutive turns of a
conversation into fixed-token-budget chunks (context windows) — the
batching-for-transport idea of the reference's batch processor
(``processor/batchprocessor/batch_processor.go:151-163`` closes a batch
when the size threshold is reached) applied to token budgets instead of
record counts, with the same invariant: packing changes GROUPING, never
content or order.

Greedy rule: walk turns in (conv_id, turn_idx) order; start a new chunk
when adding the next turn would exceed ``budget`` (an oversized single
turn still gets its own chunk — the splitLogs analog never drops data).
The running total with reset is inherently sequential, so this is an
``applyInPandas`` per conversation: groups are conversation-sized (tens
of rows), the scan inside each group is a tight numpy loop over one Arrow
batch, and the only shuffle is the groupBy(conv_id) the downstream
per-conversation writes need anyway. At 100 TB the grouping key keeps
every task independent; no global state, no driver involvement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_col: str,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Assign each row a ``chunk_id`` (0-based per conversation) by greedy
    budget packing over ``token_col`` in ``order_col`` order."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # fresh StructType — StructType.add would MUTATE df's cached schema
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("chunk_id", T.IntegerType())]
    )
    cols = [f.name for f in out_schema.fields]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        # NULL token counts arrive as NaN (pandas upcasts nullable ints to
        # float64); pack them at zero cost instead of int(nan)-crashing the
        # job — per-row degradation, same policy as the samplers' try_cast
        toks = pd.to_numeric(pdf[token_col], errors="coerce").fillna(0).to_numpy()
        chunks = np.empty(len(toks), dtype=np.int32)
        acc, chunk = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if acc > 0 and acc + t > budget:
                chunk += 1
                acc = 0
            acc += t
            chunks[i] = chunk
        pdf = pdf.assign(chunk_id=chunks)
        return pdf[cols]

    return df.groupBy(conv_col).applyInPandas(_pack, schema=out_schema)


def chunk_stats(packed: DataFrame, token_col: str, conv_col: str = "conv_id") -> DataFrame:
    """Per-chunk rollup: (conv, chunk_id, n_turns, chunk_tokens) — the
    per-batch size accounting the batch processor reports
    (``batch_send_size``, batchprocessor/metrics.go:28-50)."""
    return packed.groupBy(conv_col, "chunk_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(token_col).cast("bigint").alias("chunk_tokens"),
    )


def chunk_documents(
    df: DataFrame,
    window: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-window token chunking with overlap — the context-window
    preprocessing step for pretraining/RAG corpora (the per-document
    counterpart of :func:`pack_sequences`, which packs across turns).

    A document's whitespace tokens become chunks of ``window`` tokens whose
    starts advance by ``window - overlap``; the tail chunk may be shorter;
    zero-token documents yield no chunks. Chunking STOPS at the first chunk
    that reaches the document end — with overlap > 0, naively advancing
    starts to ``len`` would emit tail chunks wholly contained in the
    previous chunk (duplicate training text for every doc whose length puts
    a late start inside the prior window). Output:
    ``(id, chunk_idx, chunk_text, n_tokens)``.

    Scale shape: tokens/sequence/slice are JVM expressions inside one
    Generate over the scan — no shuffle, no Python; output size is
    ~len/(window-overlap) rows per doc, linear in the corpus.
    """
    if not 0 <= overlap < window:
        raise ValueError("require 0 <= overlap < window")
    from opentelemetry_collector_spark.operators.text import tokens

    step = window - overlap
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    n = F.size("_w")
    # chunks needed to cover the doc: 1 + ceil((len - window) / step) once
    # len exceeds one window (closed form; magnitudes are document lengths,
    # so the double division is exact)
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(window)) / F.lit(step))
    )
    starts = F.when(
        n > 0,
        F.sequence(F.lit(1), F.lit(1) + (n_chunks.cast("int") - 1) * F.lit(step), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    exploded = base.select(
        F.col(id_col), F.col("_w"), F.posexplode(starts).alias("chunk_idx", "_s")
    )
    piece = F.slice(F.col("_w"), F.col("_s"), window)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("n_tokens"),
    )


def turn_context_windows(
    df: DataFrame,
    k: int,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Sliding k-turn context windows per conversation — the SFT/dialog
    featurization shape (each training example = a turn plus its k-1
    predecessors, concatenated in the stable (conv_id, turn_idx) order the
    north_rule pins). Only FULL windows emit: a conversation with fewer
    than ``k`` turns yields nothing, and the first k-1 turns of each
    conversation anchor no window. NULL texts are not turns: collect_list
    skips them, so any window touching one comes up short of ``k`` and is
    dropped — junk isolates, it never silently concatenates as empty.

    One collect_list over a bounded ROWS frame on
    ``hashpartitioning(conv_col)`` — the ordering invariant's own
    partitioning, the same single exchange as every other per-conversation
    window here. The frame is k rows regardless of conversation length, so
    a hot conversation costs O(len * k), never O(len^2). Output:
    (conv_col, end turn's order value, n_turns, context string).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    w = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(-(k - 1), 0)
    )
    out = df.select(
        F.col(conv_col),
        F.col(order_col).alias("end_idx"),
        F.size(F.collect_list(text_col).over(w)).alias("n_turns"),
        F.array_join(F.collect_list(text_col).over(w), sep).alias("context"),
    )
    return out.filter(F.col("n_turns") == k)
