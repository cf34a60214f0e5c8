"""Exact-substring duplication marking (corpus-prep dedup at span granularity).

The finest-grained member of the dedup suite (``operators/dedup.py`` covers
whole-document exact/minhash/simhash): mark, per document, the character
spans covered by any length-``L`` substring that occurs more than once in
the corpus — the anchor-gram formulation of exact-substring deduplication
(every duplicated substring of length >= L is a union of duplicated
L-grams, so the L-gram cover IS the >=L duplicated-span cover).

Pipeline shape (all JVM expressions — no Python):

1. explode every char L-gram anchor position (one row per position; this
   linear blow-up is inherent to exact-substring dedup and shuffles hashed
   ``bigint`` keys, not text);
2. global occurrence count per gram hash -> duplicated iff count > 1
   (same-document repeats count, matching the "occurs more than once in
   the corpus" rule);
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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _gram_positions(text: Column, min_len: int) -> Column:
    """(pos, hash) structs for every L-gram anchor; short docs -> empty."""
    n = F.length(text)
    idx = F.sequence(F.lit(1), n - F.lit(min_len - 1))
    grams = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.pmod(F.xxhash64(text.substr(i, F.lit(min_len))), F.lit((1 << 63) - 1)).alias("g"),
        ),
    )
    return F.when(n >= min_len, grams).otherwise(
        F.array().cast("array<struct<pos:int,g:bigint>>")
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

    base = spread(df).select(
        F.col(id_col), F.length(F.col(text_col)).alias("n_chars"),
        _gram_positions(F.col(text_col), min_len).alias("_gp"),
    )
    pos = base.select(id_col, F.explode("_gp").alias("e")).select(
        id_col, F.col("e.pos").alias("pos"), F.col("e.g").alias("g")
    )
    # duplicated grams: total occurrence count > 1 (map-side partial agg;
    # the join back is on the hashed gram key)
    dup_grams = pos.groupBy("g").agg(F.count(F.lit(1)).alias("_c")).filter(F.col("_c") > 1)
    hits = pos.join(dup_grams.select("g"), "g").select(
        id_col, "pos", (F.col("pos") + min_len - 1).alias("end")
    )
    # gaps-and-islands: a window starts a new span when its pos exceeds the
    # running max end of everything before it (per doc, position order)
    w = Window.partitionBy(id_col).orderBy("pos", "end")
    prev_max_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    marked = hits.withColumn(
        "_new", F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end + 1), 1).otherwise(0)
    )
    spans = (
        marked.withColumn("_sid", F.sum("_new").over(w))
        .groupBy(id_col, "_sid")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_chars"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    out = base.select(id_col, "n_chars").join(per_doc, id_col, "left").na.fill(
        {"dup_chars": 0, "n_spans": 0}
    )
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
