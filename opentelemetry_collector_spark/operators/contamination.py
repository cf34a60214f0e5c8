"""Benchmark decontamination: word n-gram overlap against a held-out eval set.

The training-data-pipeline counterpart of the filter processor's
include/exclude drop (``processor/filterprocessor/filter_processor.go:117-187``):
instead of matching configured literals, the "exclude set" is every word
n-gram that appears in an evaluation corpus, and a training document is
flagged (or dropped) when any of its n-grams collides — the standard
contamination check used before pretraining.

Scale shape: eval benchmarks are small by construction, so their distinct
gram set broadcasts; the training side is one explode + broadcast-hash
semi-join + per-doc agg — linear in corpus size, no shuffle of the corpus
text itself (only (id, gram-hit) pairs reach the agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.text import tokens


def word_ngrams(col: Column, n: int = 5) -> Column:
    """Overlapping word n-grams as joined strings ("w1 w2 ... wn")."""
    w = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    # sequence(1, k) with k < 1 would count DOWN (step defaults to -1) —
    # guard short docs to an empty array instead
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def hashed_word_ngrams(col: Column, n: int = 5) -> Column:
    """Overlapping word n-grams as 64-bit hashes (xxhash64 over the token
    slice — no per-gram string materialization). Both sides of the
    contamination join use this, so only 8-byte keys ever leave the scan;
    63-bit collisions are negligible at any realistic gram cardinality."""
    w = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
        lambda i: F.xxhash64(F.slice(w, i, n)),
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<bigint>"))


def eval_gram_set(eval_df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Distinct hashed n-grams of the eval corpus (the broadcast side)."""
    return (
        eval_df.select(F.explode(hashed_word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def importance_mass(
    train_df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """DSIR-style n-gram importance evidence (data selection via importance
    resampling, Xie et al. 2023, arXiv:2302.03169): score raw documents by
    how much their n-gram occurrence mass concentrates in a small TARGET
    corpus relative to the raw corpus itself — the hashed-ngram feature
    space of the paper, with the log-ratio replaced by an integer-exact
    proxy so any engine reproduces every score bit-for-bit (libm logs
    differ in the last ulp across engines). Per document:

      n_grams   = size of the word n-gram MULTISET (repeats count)
      tgt_mass  = sum over gram occurrences of that gram's occurrence
                  count in the target corpus
      raw_mass  = same against the raw corpus (always >= n_grams)
      score_ppm = (tgt_mass * 1_000_000) DIV raw_mass  (0 for empty docs)

    score_ppm rises with p_target(doc)/p_raw(doc) under occurrence-frequency
    unigram LMs over n-grams; downstream selection keeps top-k by score or
    rate-samples proportional to it.

    Scale shape: the target corpus is small by construction, so its gram
    counts broadcast; the raw corpus is scanned twice (gram postings and the
    partial-aggregated gram-count table), both embarrassingly parallel, and
    the count table joins back to the postings gram-to-gram on 8-byte hashed
    keys — here AQE broadcasts it, at corpus scale it degrades to the
    co-partitioned shuffle join both sides already hash on. The per-doc
    rollup partial-aggregates before its shuffle; raw text never shuffles
    (a persist() of the postings frame trades the second scan for cache at
    real scale if the scan dominates).
    """
    from opentelemetry_collector_spark.session import spread

    posted = spread(train_df).select(
        F.col(id_col),
        F.explode_outer(hashed_word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    raw_counts = (
        posted.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.count("*").alias("_rc"))
    )
    tgt_counts = (
        target_df.select(F.explode(hashed_word_ngrams(F.col(text_col), n)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("_tc"))
    )
    rolled = (
        posted.join(F.broadcast(tgt_counts), "gram", "left")
        .join(raw_counts, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("_n"),
            F.sum(F.coalesce(F.col("_tc"), F.lit(0))).alias("_t"),
            F.sum(F.coalesce(F.col("_rc"), F.lit(0))).alias("_r"),
        )
    )
    return rolled.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_grams"),
        F.col("_t").cast("bigint").alias("tgt_mass"),
        F.col("_r").cast("bigint").alias("raw_mass"),
        # decimal(38,0) intermediate: bigint _t * 1e6 would ANSI-overflow
        # past tgt_mass ~9.2e12, which a 100 TB corpus can reach; DuckDB's
        # sum() is int128 already, so this keeps the engines bit-identical
        F.when(
            F.col("_r") > 0, F.expr("CAST(_t AS DECIMAL(38,0)) * 1000000 DIV _r")
        ).otherwise(F.lit(0)).cast("bigint").alias("score_ppm"),
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per training doc: distinct-gram total, eval-colliding gram count,
    overlap per-mille, and the contaminated flag (>=1 collision).

    Grams are deduplicated per doc before the join so ``matched_grams`` is
    "how many DISTINCT n-grams leak", invariant to in-doc repetition.
    """
    from opentelemetry_collector_spark.session import spread

    # the n-gram transform is per-row array work over the whole corpus — a
    # single-split scan would serialize it on one core (no-op on wide scans).
    # explode_outer keeps zero-gram (short) docs as a single null-gram row so
    # they survive to the output with n_grams = 0.
    posted = spread(train_df).select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(hashed_word_ngrams(F.col(text_col), n))
        ).alias("gram"),
    )
    ev = eval_gram_set(eval_df, text_col, n).withColumn("_hit", F.lit(1))
    out = (
        posted.join(F.broadcast(ev), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("gram").alias("_n"),
            F.count("_hit").alias("_m"),
        )
    )
    return out.select(
        F.col(id_col),
        F.col("_n").cast("bigint").alias("n_grams"),
        F.col("_m").cast("bigint").alias("matched_grams"),
        F.when(F.col("_n") > 0, F.floor(F.col("_m") * 1000.0 / F.col("_n")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("overlap_pm"),
        (F.col("_m") > 0).alias("contaminated"),
    )
