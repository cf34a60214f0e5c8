"""Inverted text index: build/serve split on posting lists.

The text-search analog of ``similarity.ivf_write_index``: the corpus is
read ONCE at build time into term postings partitioned by a hash bucket of
the term, plus a term-dictionary sidecar; serving a query then reads only
the buckets its terms hash into (literal partition filter -> static
pruning), scores with whole-bit idf (the ``text.surprisal_bits`` integer
technique — no float anywhere, so scores and therefore rankings are
engine- and replay-stable), and top-k's via TakeOrderedAndProject.

Scale shape:

- **build**: one explode + one (doc, term) partial-aggregated groupBy; the
  postings shuffle is keyed by the term bucket so every bucket file holds
  complete posting lists for its terms;
- **serve**: a q-term query touches at most q of the ``n_buckets``
  partitions regardless of corpus size; scoring is one partial-aggregated
  groupBy over the matched postings and the global top-k keeps k rows per
  task (never a global sort).

Matching is bag-of-words sum-of-weights (disjunctive); conjunctive
filtering composes by requiring ``n_hit == len(terms)``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.text import tokens

_POSTINGS = "postings"
_TERMS = "terms"


def _bucket(col, n_buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def write_text_index(
    df: DataFrame,
    id_col: str,
    path: str,
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict[str, int]:
    """Build the index at ``path``: ``postings/`` parquet partitioned by
    ``_bucket`` holding (term, doc id, tf), and ``terms/`` holding the
    term dictionary (term, doc freq, idf bits) plus the corpus doc count.
    Returns build stats."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    tf = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n_docs = df.select(id_col).distinct().count()
    max_bits = len(bin(n_docs)) - 2 if n_docs else 0
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("doc_freq"))
    terms = dfreq.select(
        "term",
        "doc_freq",
        (F.lit(max_bits) - F.length(F.bin("doc_freq")) + 1).cast("int").alias("idf_bits"),
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        F.lit(int(n_buckets)).cast("int").alias("n_buckets"),
    )
    (
        tf.withColumn("_bucket", _bucket(F.col("term"), n_buckets))
        .repartition(n_buckets, "_bucket")
        .write.mode("overwrite")
        .partitionBy("_bucket")
        .parquet(os.path.join(path, _POSTINGS))
    )
    terms.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, _TERMS))
    n_terms = terms.count()
    return {"n_docs": int(n_docs), "n_terms": int(n_terms), "n_buckets": int(n_buckets)}


def search_text_index(
    spark: SparkSession,
    path: str,
    query: str,
    k: int = 10,
    require_all: bool = False,
) -> DataFrame:
    """Top-k docs for ``query`` from a written index: reads ONLY the
    partitions the query's terms hash into. Score = sum of
    ``tf * idf_bits`` over matched terms (the dictionary's smoothed
    whole-bit idf, all integer); ties break on doc id. ``require_all``
    keeps only docs matching every distinct query term (conjunctive AND).
    Duplicate query terms count once — the query is a term set, matching
    the index's (term, doc) granularity. Output: (doc_id, n_hit, score).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    qterms = sorted({t for t in query.split() if t})
    terms_df = spark.read.parquet(os.path.join(path, _TERMS))
    posts = spark.read.parquet(os.path.join(path, _POSTINGS))
    if qterms and terms_df.select("n_buckets").first() is not None:
        n_buckets = int(terms_df.select("n_buckets").first()["n_buckets"])
        # bucket of each query term via the SAME JVM xxhash64 the build
        # used — a driver-sized frame, collected into a literal partition
        # filter (static pruning, the ivf_probe_index mechanism)
        qdf = spark.createDataFrame([(t,) for t in qterms], ["term"])
        buckets = sorted(
            {
                r["_b"]
                for r in qdf.select(
                    _bucket(F.col("term"), n_buckets).alias("_b")
                ).collect()
            }
        )
        posts = posts.filter(F.col("_bucket").isin(buckets))
    else:
        qdf = spark.createDataFrame([], "term string")
        posts = posts.limit(0)
    qweights = qdf.join(terms_df.select("term", "idf_bits"), "term")
    matched = posts.join(F.broadcast(qweights), "term")
    scored = matched.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit"),
        F.sum(F.col("tf") * (F.col("idf_bits"))).cast("bigint").alias("score"),
    )
    if require_all:
        scored = scored.filter(F.col("n_hit") == len(qterms))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
