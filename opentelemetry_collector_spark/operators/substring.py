"""Exact-substring duplication marking (corpus-prep dedup at span granularity).

The finest-grained member of the dedup suite (``operators/dedup.py`` covers
whole-document exact/minhash/simhash): mark, per document, the character
spans covered by any length-``L`` substring that occurs more than once in
the corpus — the anchor-gram formulation of exact-substring deduplication
(every duplicated substring of length >= L is a union of duplicated
L-grams, so the L-gram cover IS the >=L duplicated-span cover).

Pipeline shape (one Arrow numpy kernel for the anchor hot loop, JVM
expressions everywhere else — same split as the minhash suite):

1. emit every char L-gram anchor position as (id, pos, hash) via a
   batch-vectorized rolling-window hash kernel (``mapInPandas``; the
   Catalyst HOF formulation was interpreted per element and quadratic per
   doc — see ``_batch_gram_positions``); this linear blow-up is inherent
   to exact-substring dedup and shuffles hashed ``bigint`` keys, not text;
2. global occurrence count per gram hash via a count window over the gram
   key -> duplicated iff count > 1 (same-document repeats count, matching
   the "occurs more than once in the corpus" rule); the window form keeps
   the expensive gram transform single-evaluation where a groupBy +
   join-back would recompute it for the probe side;
3. per-doc interval union of the surviving [pos, pos+L-1] windows via the
   classic gaps-and-islands window (cumulative max of interval end over a
   per-doc position sort) — the shuffle is keyed by doc and bounded by
   text length, and AQE handles long-doc skew;
4. per-doc totals: duplicated chars, span count, per-mille fraction.

63-bit gram hashes stand in for the substrings (collision odds ~1e-13 per
pair at corpus sizes where |grams| << 2^31 — the q25/shingle_hash parity
argument), so the duplicated set is exact in expectation without shuffling
raw text.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.shingle_hash import _mix64

_FNV_PRIME = np.uint64(1099511628211)


def _batch_gram_positions(
    texts: pd.Series, min_len: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All L-gram anchors of one Arrow batch: (doc idx repeats, 1-based char
    pos, mixed 64-bit window hash). The window hash is the shingle_hash
    polynomial pass over UTF-32 code units — O(n_chars x L) C kernel work,
    where the Catalyst HOF formulation (``transform`` + ``substr``) was
    interpreted per element AND O(pos) per ``UTF8String.substring`` call
    (quadratic per doc; measured 3.7 s -> <0.3 s on the sf0.1 corpus)."""
    blobs = [s.encode("utf-32-le") for s in texts.astype("string").fillna("").tolist()]
    lengths = np.array([len(b) // 4 for b in blobs], dtype=np.int64)
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint32).astype(np.uint64)
    doc_starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))

    counts = np.maximum(lengths - min_len + 1, 0)
    total_w = int(counts.sum())
    if not total_w:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int64),
        )
    rep_doc = np.repeat(np.arange(len(blobs)), counts)
    csum = np.cumsum(counts) - counts
    intra = np.arange(total_w) - np.repeat(csum, counts)
    pos = np.repeat(doc_starts, counts) + intra
    h = np.zeros(total_w, dtype=np.uint64)
    for j in range(min_len):
        h = h * _FNV_PRIME + buf[pos + j]
    return rep_doc, (intra + 1).astype(np.int32), _mix64(h).view(np.int64)


def _gram_positions_df(
    df: DataFrame, id_col: str, text_col: str, min_len: int
) -> DataFrame:
    """(id, pos, g) rows for every char L-gram anchor; short docs emit none."""
    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rep, pos, g = _batch_gram_positions(pdf[text_col], min_len)
            yield pd.DataFrame(
                {id_col: pdf[id_col].values[rep], "pos": pos, "g": g}
            )

    return df.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} {id_type}, pos int, g bigint"
    )


def _merge_spans(hits: DataFrame, id_col: str) -> DataFrame:
    """(id, pos, end) windows -> maximal merged (id, s, e) spans via the
    classic gaps-and-islands window: a window starts a new span when its
    pos exceeds the running max end of everything before it (per doc,
    position order). Adjacent spans (gap 0) merge too."""
    w = Window.partitionBy(id_col).orderBy("pos", "end")
    prev_max_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = hits.withColumn(
        "_new", F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1).otherwise(0)
    )
    return (
        marked.withColumn("_sid", F.sum("_new").over(w))
        .groupBy(id_col, "_sid")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str = "text", min_len: int = 40
) -> DataFrame:
    """Per doc: characters covered by corpus-duplicated ``min_len``-grams.

    Output: ``(id, n_chars, dup_chars, dup_pm, n_spans)`` — ``dup_chars``
    is the size of the union of all duplicated-gram windows, ``n_spans``
    the number of maximal merged spans, ``dup_pm`` the per-mille fraction
    (integer-exact for cross-engine hashing).
    """
    from opentelemetry_collector_spark.session import spread

    base = spread(df)
    pos = _gram_positions_df(base, id_col, text_col, min_len)
    # duplicated grams: occurrence count > 1 via a count window over the
    # hashed gram key — ONE shuffle of the position rows and ONE evaluation
    # of the O(n_chars x L) gram transform, where a groupBy + join-back
    # would shuffle the positions anyway AND recompute the grams for the
    # probe side (measured 2x on the sf0.1 corpus)
    w_g = Window.partitionBy("g")
    hits = (
        pos.withColumn("_c", F.count(F.lit(1)).over(w_g))
        .filter(F.col("_c") > 1)
        .select(id_col, "pos", (F.col("pos") + min_len - 1).alias("end"))
    )
    spans = _merge_spans(hits, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    lengths = df.select(F.col(id_col), F.length(F.col(text_col)).alias("n_chars"))
    out = lengths.join(per_doc, id_col, "left").na.fill({"dup_chars": 0, "n_spans": 0})
    return out.select(
        F.col(id_col),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("dup_chars"),
        F.when(F.col("n_chars") > 0, F.floor(F.col("dup_chars") * 1000.0 / F.col("n_chars")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("dup_pm"),
        F.col("n_spans"),
    )


def remove_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str = "text", min_len: int = 40
) -> DataFrame:
    """Destructive exact-substring dedup: CUT every duplicated span except
    its first corpus occurrence (the ExactSubstr policy of Lee et al. 2022,
    arXiv:2107.06499 — one copy of the duplicated text survives, every
    other occurrence is excised). ``duplicated_spans`` is the audit form;
    this is the transform corpora actually ship through.

    "First occurrence" is the gram's minimum (id, pos) — a total order both
    engines reproduce, so the decision is deterministic at any parallelism.
    A document may keep one span and lose another; a doc that holds a
    gram's only first occurrence keeps those characters even when later
    grams of the same doc are cut.

    Output: one row per input doc — ``(id, cleaned string, n_chars bigint,
    removed_chars bigint, n_cuts bigint)``; ``cleaned`` is the original
    text with the cut spans spliced out (empty string when everything was
    a repeat). NULL text stays NULL (n_chars 0).

    Scale shape: the anchor kernel + ONE shuffle of hashed (id, pos, g)
    rows for the two same-partition windows (occurrence count + first-
    occurrence rank share the gram-key exchange), one doc-keyed span merge
    (bounded by text length), then the splice — per-doc span arrays are
    small, so the interpreted HOF aggregate touches dozens of elements,
    never the corpus. Raw text rides only the final doc-keyed join.
    """
    from opentelemetry_collector_spark.session import spread

    base = spread(df)
    pos = _gram_positions_df(base, id_col, text_col, min_len)
    w_g = Window.partitionBy("g")
    w_rank = Window.partitionBy("g").orderBy(id_col, "pos")
    hits = (
        pos.withColumn("_c", F.count(F.lit(1)).over(w_g))
        .withColumn("_rn", F.row_number().over(w_rank))
        .filter((F.col("_c") > 1) & (F.col("_rn") > 1))
        .select(id_col, "pos", (F.col("pos") + min_len - 1).alias("end"))
    )
    spans = _merge_spans(hits, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct(F.col("s"), F.col("e")))).alias("_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("removed_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_cuts"),
    )
    joined = df.join(per_doc, id_col, "left")
    text = F.col(text_col)
    n = F.coalesce(F.length(text), F.lit(0))
    spans_arr = F.coalesce(
        F.col("_spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    # splice: fold the sorted spans with a (text-so-far, cursor) accumulator
    # appending the kept segment before each cut, then the tail after the
    # last one. Merged spans guarantee non-negative segment lengths; the
    # greatest() guards are belt-and-braces for degenerate inputs.
    cleaned = F.aggregate(
        spans_arr,
        F.struct(F.lit("").alias("t"), F.lit(0).alias("c")),
        lambda acc, sp: F.struct(
            F.concat(
                acc["t"],
                text.substr(acc["c"] + 1, F.greatest(sp["s"] - 1 - acc["c"], F.lit(0))),
            ).alias("t"),
            sp["e"].alias("c"),
        ),
        lambda acc: F.concat(
            acc["t"], text.substr(acc["c"] + 1, F.greatest(n - acc["c"], F.lit(0)))
        ),
    )
    return joined.select(
        F.col(id_col),
        cleaned.alias("cleaned"),
        n.cast("bigint").alias("n_chars"),
        F.coalesce(F.col("removed_chars"), F.lit(0)).alias("removed_chars"),
        F.coalesce(F.col("n_cuts"), F.lit(0)).alias("n_cuts"),
    )
