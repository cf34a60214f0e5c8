"""Deduplication operators for training-data pipelines.

- :func:`exact_dedup` — hash-groupBy on a normalized fingerprint. One shuffle
  on the fingerprint; survivor = min id (deterministic).
- :func:`minhash_lsh_pairs` — near-dup candidate discovery: char-k-gram
  shingles -> H minhashes (universal hashing over one xxhash64 base, all
  JVM expressions) -> banding -> bucket self-join -> exact Jaccard verify.
  The standard MinHash/LSH pipeline (Broder '97); at 100 TB the bucket join
  is the only shuffle and its keys are (band_id, band_hash) which are
  uniformly distributed by construction — no skew.
- :func:`simhash` — 64-bit SimHash (Charikar '02) via bit-vote expressions;
  near-dups have small hamming distance (bit_count(a XOR b)).
- :func:`embedding_neardup_pairs` — cosine-threshold pairs over an embedding
  column; brute-force within an id window (baseline), LSH-bucketed variant
  in operators/similarity.py is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.similarity import cosine
from opentelemetry_collector_spark.operators.text import fingerprint

# 2^31-1 (Mersenne prime): after pmod-reduction of the 64-bit base hash,
# a*base + b stays < 2^62 — no long overflow under ANSI mode.
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (fingerprint, survivor id,
    n_copies). Survivor = min(id) for determinism."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )


def shingles(col: Column, k: int = 5) -> Column:
    """Distinct char k-gram shingles of lowercased whitespace-normalized text."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def minhash_signature(shingle_col: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """H minhash values as array<bigint>.

    Universal hashing: base = xxhash64(shingle); h_i = (a_i*base + b_i) mod M
    (Mersenne 2^61-1, abs to keep positive). a_i/b_i fixed by `seed` so
    signatures are reproducible across runs/executors.
    """
    import random

    rnd = random.Random(seed)
    bases = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    mins = []
    for _ in range(num_hashes):
        a = rnd.randrange(1, _MERSENNE)
        b = rnd.randrange(0, _MERSENNE)
        mins.append(
            F.array_min(
                F.transform(bases, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE)))
            )
        )
    return F.array(*mins)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs (a_id < b_id, jaccard >= threshold).

    banding: rows_per_band = num_hashes // bands; docs sharing ANY band
    bucket become candidates; candidates are verified with EXACT shingle
    Jaccard (no false positives leave this operator).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh")
    ).withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes, seed))

    banded = base.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(F.slice(F.col("_sig"), i * r + 1, r)).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("a_id"),
            F.col("r._id").alias("b_id"),
            F.col("l._sh").alias("a_sh"),
            F.col("r._sh").alias("b_sh"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    return (
        cand.withColumn("jaccard", jaccard(F.col("a_sh"), F.col("b_sh")))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.floor(F.col("jaccard") * 1000).cast("bigint").alias("jaccard_milli"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", k: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Exact n-gram Jaccard via an inverted shingle index.

    Scale plan (not the naive O(n^2) cross join): explode distinct shingles
    to (shingle, id) postings, self-join on shingle so only documents
    sharing >=1 shingle ever pair, count shared shingles per pair with a
    grouped aggregate (map-side partial), then derive
    |A∩B| / (|A| + |B| - |A∩B|). Candidate generation is proportional to
    posting-list sizes, not n^2, and every step is a shuffle-partitioned
    join/agg — the same plan holds at 10^9 documents with AQE handling
    hot shingles.
    """
    s = df.select(F.col(id_col).alias("_id"), shingles(F.col(text_col), k).alias("_sh"))
    sizes = s.select("_id", F.size("_sh").alias("_n"))
    post = s.select("_id", F.explode("_sh").alias("_g"))
    a, b = post.alias("a"), post.alias("b")
    inter = (
        a.join(b, (F.col("a._g") == F.col("b._g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "a_id").withColumnRenamed("_n", "_na"), "a_id")
        .join(sizes.withColumnRenamed("_id", "b_id").withColumnRenamed("_n", "_nb"), "b_id")
        .withColumn("jaccard", F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i")))
        .filter(F.col("jaccard") >= threshold)
        .select(
            "a_id",
            "b_id",
            F.floor(F.col("jaccard") * 1000).cast("bigint").alias("jaccard_milli"),
        )
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: per-bit vote of token hashes."""
    from opentelemetry_collector_spark.operators.text import tokens

    toks = tokens(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        bit = F.shiftleft(F.lit(1).cast("bigint"), i)  # i=63 wraps to the sign bit, intended
        out = out.bitwiseOR(F.when(votes > 0, bit).otherwise(F.lit(0).cast("bigint")))
    return out


def simhash_neardup_pairs(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3, bits: int = 64
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming, blocked by 16-bit chunks
    (a pair within distance d<=3 must agree on >=1 of 4 chunks — pigeonhole)."""
    s = df.select(F.col(id_col).alias("_id"), simhash(F.col(text_col), bits).alias("_h"))
    chunks = s.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright(F.col("_h"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("_id", "_h", "c.chunk", "c.key")
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"),
                F.col("a._h").alias("ha"), F.col("b._h").alias("hb"))
        .dropDuplicates(["a_id", "b_id"])
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming).select(
        "a_id", "b_id", F.col("hamming").cast("int").alias("hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    max_id: int | None = None,
) -> DataFrame:
    """Cosine-threshold near-dup pairs (brute force baseline).

    max_id bounds the O(n^2) window for testing; the production path is the
    LSH-bucketed join in operators/similarity.py.
    """
    e = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if max_id is not None:
        e = e.filter(F.col("_id") < max_id)
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a._id") < F.col("b._id")).withColumn(
        "cos", cosine(F.col("a._v"), F.col("b._v"))
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        F.col("a._id").alias("a_id"),
        F.col("b._id").alias("b_id"),
        F.floor(F.col("cos") * 1000).cast("bigint").alias("cos_milli"),
    )
