"""Deduplication operators for training-data pipelines.

- :func:`exact_dedup` — hash-groupBy on a normalized fingerprint. One shuffle
  on the fingerprint; survivor = min id (deterministic).
- :func:`minhash_lsh_pairs` — near-dup candidate discovery: char-k-gram
  shingle hashes + H minhashes in ONE Arrow-batched numpy pass
  (functions/shingle_hash.py — Catalyst HOFs evaluate interpreted, measured
  ~10x slower) -> banding (JVM xxhash64 over signature slices) -> codegen'd
  (band, bucket) self-join -> exact Jaccard verify (numpy binary-search
  intersect on the sorted hash arrays). The standard MinHash/LSH pipeline
  (Broder '97); at 100 TB the bucket join is the only shuffle and its keys
  are (band_id, band_hash) which are uniformly distributed by construction
  — no skew. The Catalyst-expression forms (shingles/minhash_signature/
  jaccard below) are kept as the reference semantics the numpy kernels are
  property-tested against.
- :func:`simhash` — 64-bit SimHash (Charikar '02); the pairs op computes the
  bit votes vectorized (shingle_hash.simhash_votes, value-identical);
  near-dups have small hamming distance (bit_count(a XOR b)).
- :func:`embedding_neardup_pairs` — cosine-threshold pairs over an embedding
  column; brute-force within an id window (baseline), LSH-bucketed variant
  in operators/similarity.py is the scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from opentelemetry_collector_spark.operators.text import fingerprint

# 2^31-1 (Mersenne prime): after pmod-reduction of the 64-bit base hash,
# a*base + b stays < 2^62 — no long overflow under ANSI mode.
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (fingerprint, survivor id,
    n_copies). Survivor = min(id) for determinism.

    NULL text has no fingerprint and never matches anything (the same
    NULL-equi-join semantics as :func:`exact_dedup_against`): each NULL-text
    row is its own singleton, not a member of one giant NULL cluster."""
    fp = df.withColumn("fp", fingerprint(F.col(text_col)))
    grouped = (
        fp.filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
    )
    singletons = fp.filter(F.col("fp").isNull()).select(
        "fp",
        F.col(id_col).alias("survivor_id"),
        F.lit(1).cast("bigint").alias("n_copies"),
    )
    return grouped.unionByName(singletons)


def normalize_text(col: Column) -> Column:
    """Lowercased, whitespace-collapsed, trimmed text (the canonical form
    shingling/tokenizing operate on)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def shingles_of_normalized(norm: Column, k: int = 5) -> Column:
    """Distinct char k-gram shingles of ALREADY-normalized text.

    PERF: callers must materialize the normalized text as its own column
    first (``withColumn("_norm", normalize_text(...))``). Inlining the
    normalization into the lambda makes Spark re-evaluate the regex for
    every array element — O(len^2) regex work per document (measured 4x
    end-to-end on the sf0.1 documents corpus)."""
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: norm.substr(i, F.lit(k))))


def shingles(col: Column, k: int = 5) -> Column:
    """Distinct char k-gram shingles of lowercased whitespace-normalized text.

    Convenience composition for small inputs/tests; hot paths should
    normalize into a column first (see :func:`shingles_of_normalized`)."""
    return shingles_of_normalized(normalize_text(col), k)


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [(rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE)) for _ in range(num_hashes)]


def minhash_signature_from_bases(bases: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """H minhash values as array<bigint> from a pre-hashed shingle column.

    ``bases`` must be a MATERIALIZED array<bigint> column of
    ``pmod(xxhash64(shingle), M)`` values — each of the H universal hashes
    walks it once; if the base-hash expression were inlined here it would be
    re-evaluated H times per document."""
    return F.array(
        *[
            F.array_min(
                F.transform(bases, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE)))
            )
            for a, b in _hash_params(num_hashes, seed)
        ]
    )


def shingle_bases(shingle_col: Column) -> Column:
    """xxhash64-mod-M base hashes for a shingle array (materialize me)."""
    return F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def minhash_signature(shingle_col: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """H minhash values as array<bigint>.

    Universal hashing: base = xxhash64(shingle) mod M; h_i = (a_i*base + b_i)
    mod M (Mersenne 2^31-1 keeps a*base inside int64). a_i/b_i fixed by
    `seed` so signatures are reproducible across runs/executors.
    Convenience composition — hot paths materialize :func:`shingle_bases`
    first and call :func:`minhash_signature_from_bases`."""
    return minhash_signature_from_bases(shingle_bases(shingle_col), num_hashes, seed)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def sorted_intersect_size(a: Column, b: Column) -> Column:
    """|A ∩ B| for pairs of SORTED distinct int64 arrays (Arrow-batched C
    binary search; the vectorized replacement for interpreted
    array_intersect — UDF created lazily so module import needs no session).

    Shape note (measured): the per-pair loop stays — each iteration is one
    C searchsorted over a ~300-element sorted array (~14 us including loop
    overhead). A "fully vectorized" whole-batch formulation (flatten to a
    (pair, value) table, one lexsort, count adjacent dups) is 38x SLOWER
    at 10k pairs x 300 elems: the O(N log N) sort of the 6M-element
    flattened batch dwarfs 10k binary-search passes that exploit the
    arrays' existing sortedness.
    """

    def _impl(aa, bb):
        import numpy as np
        import pandas as pd

        out = np.empty(len(aa), dtype=np.int32)
        for i, (x, y) in enumerate(zip(aa, bb)):
            xa = np.asarray(x, dtype=np.int64)
            ya = np.asarray(y, dtype=np.int64)
            if xa.size == 0 or ya.size == 0:
                out[i] = 0
                continue
            idx = np.searchsorted(ya, xa)
            idx[idx == ya.size] = ya.size - 1
            out[i] = int(np.count_nonzero(ya[idx] == xa))
        return pd.Series(out)

    return F.pandas_udf(_impl, "int")(a, b)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    verify_strategy: str = "auto",
    broadcast_verify_limit: int = 256 << 20,
) -> DataFrame:
    """Near-duplicate pairs (a_id < b_id, jaccard >= threshold).

    banding: rows_per_band = num_hashes // bands; docs sharing ANY band
    bucket become candidates; candidates are verified with EXACT shingle
    Jaccard (no false positives leave this operator).

    verify_strategy — how candidate pairs get their shingle arrays back:

    - ``"shuffle"``: two joins re-attach the arrays per pair (the 100 TB
      shape: partition-parallel, nothing driver-sized);
    - ``"broadcast"``: collect the (id -> sorted shingles) map once and
      verify pairs in a single Arrow pass with local lookups — the two
      array-carrying joins disappear (measured: the attach joins shipped
      ~2x corpus bytes per run at sf0.1);
    - ``"auto"``: broadcast when the estimated map size (row count from the
      already-materialized signature count x mean shingle bytes) fits
      ``broadcast_verify_limit``, else shuffle — the same size-based switch
      AQE applies to joins, made explicit because the estimate needs the
      eager persist's row count.

    Cache contract (this and the other pair operators): the signature table
    stays persisted after the call — the returned frame depends on it
    lazily, so the operator cannot unpersist it. Long-lived drivers calling
    repeatedly should ``spark.catalog.clearCache()`` between rounds (or
    consume + checkpoint the result); a one-shot dedup job never notices.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # one Arrow-vectorized pass computes hashed shingles + signatures
    # (numpy rolling hash; Catalyst HOFs are interpreted — see
    # functions/shingle_hash.py for the measured 10x)
    from opentelemetry_collector_spark.functions.shingle_hash import shingle_hash_table
    from opentelemetry_collector_spark.session import spread

    # narrow scans (one small file) would serialize the shingle+minhash
    # kernel on one core — no-op when the scan is already wide
    base = shingle_hash_table(
        spread(df), id_col=id_col, text_col=text_col, k=k, num_hashes=num_hashes, seed=seed
    )
    # the signature table feeds multiple plan branches (both sides of the
    # banded self-join, plus — under shuffle verify — the two array
    # re-attach joins). Those branches are all ROOT stages of the final
    # job, so Spark schedules them concurrently and each would recompute
    # the shingling before the lazy cache fills — persist must be EAGER
    # here (measured 25s -> 13s on sf0.1). This is the canonical
    # "materialize the signatures" step of every LSH pipeline; for 100 TB
    # corpora write them to a table instead (and the persist cost itself is
    # one linear scan).
    base = base.persist()
    # the materializing action doubles as the size estimate for the verify
    # strategy switch (mean shingle bytes x docs)
    _stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.size("_sh")).alias("sh")
    ).first()
    n_docs, total_shingles = _stats["n"] or 0, _stats["sh"] or 0

    # the banded self-join carries ONLY (id, band, bucket) — shingle arrays
    # are re-attached after dedup of candidate pairs, so the 8x band
    # explosion never ships document payloads through the shuffle
    banded = base.select(
        "_id",
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
    ).select("_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # candidate pairs via a (band,bucket) self-join: whole-stage-codegen'd
    # hash join beats the earlier collect_list + HOF pair expansion 2.2x
    # (HOF lambdas evaluate interpreted). The join's two scan branches both
    # read the EAGERLY-persisted signature table, so the signature stage
    # still runs once; bucket keys are uniform by construction so the join
    # shuffle has no skew, and AQE coalesces the small partitions.
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("a_id"), F.col("b._id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    strategy = verify_strategy
    if strategy == "auto":
        est_bytes = total_shingles * 8 + n_docs * 64
        strategy = "broadcast" if est_bytes <= broadcast_verify_limit else "shuffle"

    if strategy == "broadcast":
        # the whole (id -> sorted shingles) map fits comfortably in executor
        # memory: verify every candidate pair in ONE Arrow pass with local
        # lookups instead of two array-carrying joins (which shipped ~2x
        # corpus bytes through the shuffle at sf0.1). Same switch AQE makes
        # for joins, explicit here because the row count comes from the
        # eager persist above.
        import numpy as np

        pdf_map = base.select("_id", "_sh").toPandas()
        bc = df.sparkSession.sparkContext.broadcast(
            dict(zip(pdf_map["_id"], (np.asarray(v, dtype=np.int64) for v in pdf_map["_sh"])))
        )
        id_type = cand.schema["a_id"].dataType.simpleString()

        # Kernel-shape note (r3): the per-candidate loop below was measured
        # against two "flattened" single-pass vectorizations at the q19
        # shape (50k pairs x 300 sorted shingles): global lexsort +
        # adjacent-dup count 19.8 s, rank-pack + one big searchsorted
        # 11.1 s, THIS loop 0.38 s. Each iteration is one C searchsorted
        # over a ~300-element array that stays in L1; the flattened forms
        # pay O(N log N) over 30M elements instead. Row-at-a-time Python
        # here is 50k dict lookups per Arrow batch, not per-row work on
        # the corpus — and the batch is LSH-bounded by construction.
        def _verify(batches):
            import pandas as pd

            m = bc.value
            for pdf in batches:
                a_ids, b_ids = pdf["a_id"].values, pdf["b_id"].values
                jac = np.empty(len(pdf), dtype=np.float64)
                for i in range(len(pdf)):
                    xa, ya = m[a_ids[i]], m[b_ids[i]]
                    if xa.size == 0 or ya.size == 0:
                        jac[i] = 0.0
                        continue
                    idx = np.searchsorted(ya, xa)
                    idx[idx == ya.size] = ya.size - 1
                    inter = int(np.count_nonzero(ya[idx] == xa))
                    jac[i] = inter / (xa.size + ya.size - inter)
                yield pd.DataFrame({"a_id": a_ids, "b_id": b_ids, "jaccard": jac})

        verified = cand.mapInPandas(
            _verify, f"a_id {id_type}, b_id {id_type}, jaccard double"
        )
    else:
        sh = base.select("_id", "_sh")
        verified = (
            cand.join(sh.select(F.col("_id").alias("a_id"), F.col("_sh").alias("a_sh")), "a_id")
            .join(sh.select(F.col("_id").alias("b_id"), F.col("_sh").alias("b_sh")), "b_id")
        )
        # exact verify: array_intersect is an interpreted expression — on a
        # pair-dense corpus (sf0.1: 184k candidates x ~300 shingles) it was
        # 15 s of the 24 s total. The _sh arrays arrive SORTED from
        # shingle_hash_table, so a numpy merge in one Arrow batch pass does
        # the same count in C.
        inter = sorted_intersect_size(F.col("a_sh"), F.col("b_sh"))
        verified = verified.withColumn(
            "jaccard", inter / (F.size("a_sh") + F.size("b_sh") - inter)
        )
    return (
        verified.filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.floor(F.col("jaccard") * 1000).cast("bigint").alias("jaccard_milli"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_df: int | None = None,
    hot_shingle_limit: int = 4096,
) -> DataFrame:
    """Exact n-gram Jaccard via an inverted shingle index.

    Scale plan (not the naive O(n^2) cross join): explode distinct shingles
    to (shingle, id) postings, self-join on shingle so only documents
    sharing >=1 shingle ever pair, count shared shingles per pair with a
    grouped aggregate (map-side partial), then derive
    |A∩B| / (|A| + |B| - |A∩B|). Candidate generation is proportional to
    Σ df² over posting lists, not n², and every step is a shuffle-
    partitioned join/agg.

    ``max_df`` is the quadratic-blowup guard (the same contract as
    ``similarity.sparse_cosine_pairs``): a shingle appearing in f documents
    contributes f² candidate pairs, so ONE boilerplate 5-gram shared by
    every document makes the join Θ(n²) no matter how the partitions are
    balanced — AQE can spread the skew, not shrink the pair count. With
    ``max_df`` set, shingles with df > max_df are dropped BEFORE the
    self-join and the Jaccard is computed over the PRUNED shingle space
    (set sizes and intersections both exclude pruned shingles — a
    consistent similarity measure an oracle can replay, and near-dup
    evidence lives in rare shingles anyway, the all-pairs argument
    BENCH/ALLPAIRS.md measures). Documents whose shingles are all pruned
    cannot pair. ``None`` keeps the exact full-space semantics for
    bounded corpora.
    """
    from opentelemetry_collector_spark.functions.shingle_hash import shingle_hash_table

    # hashed-shingle postings: bigint join keys shuffle ~5x smaller than the
    # k-gram strings; 63-bit space keeps intersection counts exact in
    # expectation (collision odds ~1e-13/pair — q25 oracle parity argument)
    from opentelemetry_collector_spark.session import spread

    s = shingle_hash_table(spread(df), id_col=id_col, text_col=text_col, k=k, with_sig=False)
    # feeds sizes + both posting sides (concurrent root stages): eager
    # persist so shingling runs once
    s = s.persist()
    s.count()
    post = s.select("_id", F.explode("_sh").alias("_g"))
    if max_df is not None:
        # df-prune BEFORE the self-join. The prune MEMBERSHIP (df > max_df
        # dropped) is fixed semantics the q25 oracle replays; what is gated
        # on corpus shape is the prune MECHANISM (r3, after the q25 1.5x
        # bench regression): the hot set is tiny by construction — at most
        # total_postings / max_df shingles can exceed max_df — so probe it
        # first and prune with a literal InSet FILTER (zero extra shuffle
        # of the postings) when it fits the driver; only a corpus whose
        # hot set outgrows ``hot_shingle_limit`` pays the keep-set shuffle
        # join. Same probe-and-switch shape as minhash_lsh_pairs' verify.
        dfreq = post.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
        hot = dfreq.filter(F.col("_df") > max_df).select("_g")
        hot_rows = hot.limit(hot_shingle_limit + 1).collect()
        if not hot_rows:
            # no shingle exceeds max_df: the prune is a semantic no-op, so
            # skip it and keep the cheaper array-length sizes
            sizes = s.select("_id", F.size("_sh").alias("_n"))
        elif len(hot_rows) <= hot_shingle_limit:
            post = post.filter(~F.col("_g").isin([r["_g"] for r in hot_rows])).persist()
            sizes = post.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
        else:
            # pruned postings feed three consumers (sizes + both join
            # sides), so persist them once
            post = post.join(dfreq.filter(F.col("_df") <= max_df).select("_g"), "_g").persist()
            sizes = post.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    else:
        sizes = s.select("_id", F.size("_sh").alias("_n"))
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


def simhash_from_token_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash from a MATERIALIZED array<bigint> of token hashes.

    Each of the ``bits`` per-bit votes walks the hash array once; if the
    tokenize+hash expression were inlined, Spark would re-run the split
    regex 64 times per document (measured ~4x end-to-end on sf0.1)."""
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


def token_hashes(col: Column) -> Column:
    """xxhash64 of each whitespace token (materialize me before simhash)."""
    from opentelemetry_collector_spark.operators.text import tokens

    return F.transform(tokens(col), lambda t: F.xxhash64(t))


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: per-bit vote of token hashes.

    Convenience composition — hot paths materialize :func:`token_hashes`
    first and call :func:`simhash_from_token_hashes`."""
    return simhash_from_token_hashes(token_hashes(col), bits)


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    bits: int = 64,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming — EXACT (full recall).

    Blocking: the 64 bits split into ``max_hamming + 1`` chunks; a pair
    within distance d <= max_hamming differs in at most max_hamming chunks,
    so by pigeonhole it AGREES on at least one chunk — candidate generation
    via the (chunk, key) self-join therefore misses nothing, and the final
    bit_count filter removes false positives. (A fixed 4-chunk split only
    guarantees d <= 3; the chunk count must track the radius.)

    ``hasher``: ``"xxhash64"`` hashes tokens JVM-side (native, Spark-only);
    ``"fnv"`` uses the Arrow FNV+splitmix64 token kernel whose values an
    external SQL engine can replay (the q20 oracle) — the simhash itself is
    hash-agnostic, only the bit patterns differ."""
    from opentelemetry_collector_spark.functions.shingle_hash import (
        simhash_votes,
        token_fnv_hashes,
    )
    from opentelemetry_collector_spark.session import spread

    if hasher not in ("xxhash64", "fnv"):
        raise ValueError(f"unknown hasher: {hasher!r} (xxhash64 | fnv)")
    # token hashes stay JVM (xxhash64) or run in the same Arrow pass (fnv);
    # the 64 per-bit vote passes run vectorized in numpy (value-identical
    # — see simhash_votes docstring). spread: a single-split scan
    # serializes this stage on one core (measured 8.1 s -> 1.7 s at
    # local[32] on sf0.1)
    th = (
        token_hashes(F.col(text_col))
        if hasher == "xxhash64"
        else token_fnv_hashes(F.col(text_col))
    )
    s = (
        spread(df).withColumn("_th", th)
        .select(F.col(id_col).alias("_id"), simhash_votes(F.col("_th")).alias("_h"))
    )
    # feeds both sides of the chunk-blocked self-join (concurrent root
    # stages): eager persist so each doc is hashed once
    s = s.persist()
    s.count()
    n_chunks = max_hamming + 1
    base_w, extra = divmod(bits, n_chunks)
    offsets, widths, off = [], [], 0
    for i in range(n_chunks):
        w_i = base_w + (1 if i < extra else 0)
        offsets.append(off)
        widths.append(w_i)
        off += w_i
    chunks = s.select(
        "_id",
        "_h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        # arithmetic shift sign-extends on the top chunk; the
                        # width mask strips the extension. A full-64-bit
                        # chunk (max_hamming=0) masks with -1 (all bits set):
                        # lit(2^64-1) would overflow LongType
                        F.shiftright(F.col("_h"), offsets[i])
                        .bitwiseAND(F.lit(-1 if widths[i] == 64 else (1 << widths[i]) - 1))
                        .alias("key"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("_id", "_h", "c.chunk", "c.key")
    a, b = chunks.alias("a"), chunks.alias("b")
    ham = F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
    # verify BEFORE deduplicating: hamming is a pure map-side bit_count on
    # the join output, while dropDuplicates is a shuffle — filtering first
    # means the dedup exchange carries only true pairs (x their <=n_chunks
    # co-bucket copies) instead of every bucket collision. At radius 8 the
    # 7-bit chunk keys are dense (128 buckets), so raw candidates dominate
    # verified pairs by orders of magnitude at scale.
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a._id").alias("a_id"),
            F.col("b._id").alias("b_id"),
            ham.cast("int").alias("hamming"),
        )
        .dropDuplicates(["a_id", "b_id"])
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
    from opentelemetry_collector_spark.operators.similarity import dot, norm
    from opentelemetry_collector_spark.session import spread

    e = df.select(
        F.col(id_col).alias("_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    if max_id is not None:
        e = e.filter(F.col("_id") < max_id)
    # norm once per ROW before the join, not once per PAIR after it — the
    # O(n^2) stage then does one dot per pair instead of three
    e = e.withColumn("_n", norm(F.col("_v")))
    # the O(n^2) cosine scoring is the hot loop and the filtered scan often
    # lands in ONE split — spread the streamed side so the nested-loop join
    # fans across every core (same trick as similarity.cosine_topk)
    a, b = spread(e).alias("a"), e.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a._id") < F.col("b._id")).withColumn(
        # same NULL-on-zero-vector semantics as similarity.cosine
        "cos",
        F.try_divide(dot(F.col("a._v"), F.col("b._v")), F.col("a._n") * F.col("b._n")),
    )
    return pairs.filter(F.col("cos") >= threshold).select(
        F.col("a._id").alias("a_id"),
        F.col("b._id").alias("b_id"),
        F.floor(F.col("cos") * 1000).cast("bigint").alias("cos_milli"),
    )


# --- cluster resolution: pairs -> components -> survivors -------------------
#
# The pair operators above (minhash_lsh_pairs / simhash_neardup_pairs /
# ngram_jaccard_pairs / embedding_neardup_pairs) emit near-dup EDGES; an
# actual dedup pass must resolve those edges into connected components and
# keep one survivor per component (near-duplication is not transitive, but
# cluster-and-keep-one is the standard policy for training corpora). The
# reference collector has no graph surface at all — this is one of the
# SURVEY §2.7 gaps the Spark side fills.


def _large_star(e: DataFrame) -> DataFrame:
    # For every node u: connect all strictly-larger neighbors to
    # m = min(N(u) ∪ {u}). Operates on the bidirectional edge view.
    bidir = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bidir.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("_mn", F.col("u")).alias("_m"))
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    # Edges arrive oriented u > v. For every node u:
    # m = min(N_small(u) ∪ {u}) = min(v); connect u and every other small
    # neighbor to m.
    mins = e.groupBy("u").agg(F.min("v").alias("_m"))
    via = (
        e.join(mins, "u")
        .filter(F.col("v") != F.col("_m"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
    )
    own = mins.select("u", F.col("_m").alias("v"))
    return via.union(own).distinct()


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 30,
    driver_edge_threshold: int = 2_000_000,
) -> DataFrame:
    """Resolve an undirected edge list into components: (id, component_id)
    for every node that appears in ``pairs``; component_id = min node id.

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): converges in O(log^2 n)
    rounds on ANY graph (vs O(diameter) for naive label propagation, which
    an adversarial near-dup chain makes linear). Each round is two
    self-join+groupBy passes over the CURRENT edge set — which only
    shrinks toward the star forest — and ``localCheckpoint`` truncates the
    lineage so the plan stays flat across iterations (at real scale, swap
    for a reliable ``checkpoint`` dir so executor loss can't lose the
    iteration state). Convergence is detected by an order-independent
    (count, bit_xor(xxhash64)) signature of the edge set going stable
    (xor, not sum: never overflows under ANSI mode, and the edge set is
    distinct so identical terms cannot self-cancel).

    AQE-style size switch: the near-dup edge set is usually TINY relative
    to the corpus (it only holds duplicate pairs), while each distributed
    round below costs two shuffle passes plus a signature job — pure
    fixed overhead when the edges fit on the driver. A single
    ``limit(threshold+1).collect()`` probe decides: at or under
    ``driver_edge_threshold`` edges (~32 MB at 16 B/edge for the default)
    the probe has ALREADY collected the edge set, and an exact union-find
    with union-by-min produces the identical (id, min-id component) map —
    Python tuple/str comparison and Spark's least/greatest agree (UTF-8
    byte order preserves code-point order). Above the threshold the probe
    is discarded and the distributed loop runs unchanged; pass
    ``driver_edge_threshold=0`` to force it (tests do).
    """
    e = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v")))
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    if driver_edge_threshold > 0:
        probe = e.limit(driver_edge_threshold + 1).collect()
        if len(probe) <= driver_edge_threshold:
            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for row in probe:
                u, v = row[0], row[1]
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru != rv:
                    # union-by-min: every set's root stays its minimum id
                    parent[max(ru, rv)] = min(ru, rv)
            id_type = e.schema["u"].dataType
            schema = StructType(
                [StructField("id", id_type), StructField("component_id", id_type)]
            )
            rows = [(x, find(x)) for x in parent]
            return pairs.sparkSession.createDataFrame(rows, schema)
    prev_sig = None
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = tuple(e.agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))).first())
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # converged: e is a star forest (node -> component root)
    members = e.select(F.col("u").alias("id"), F.col("v").alias("component_id"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component_id")).distinct()
    return members.union(roots).distinct()


def dedup_clusters(
    df: DataFrame, pairs: DataFrame, id_col: str, a_col: str = "a_id", b_col: str = "b_id"
) -> DataFrame:
    """Per-document cluster map over the WHOLE corpus: (id_col,
    component_id, n_members). Documents in no pair are singleton
    components of themselves. The pair frame is tiny relative to the
    corpus (it only holds near-dups), so the component map is broadcast
    back onto the fact table — the 100 TB side is never shuffled."""
    cc = connected_components(pairs, a_col=a_col, b_col=b_col)
    sizes = cc.groupBy("component_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    # reserved internal name: joining a bare 'id' would be ambiguous when
    # id_col == 'id' and would drop a caller's own 'id' column otherwise
    cmap = cc.join(sizes, "component_id").select(
        F.col("id").alias("__cc_id"), "component_id", "n_members"
    )
    return (
        df.join(F.broadcast(cmap), df[id_col] == cmap["__cc_id"], "left")
        .withColumn("component_id", F.coalesce(F.col("component_id"), F.col(id_col)))
        .withColumn("n_members", F.coalesce(F.col("n_members"), F.lit(1).cast("bigint")))
        .drop("__cc_id")
    )


def dedup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    order_col: Column | None = None,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Keep ONE row per near-dup cluster (plus every singleton).

    Default policy: survivor = min id (deterministic, no extra shuffle —
    the row whose id IS its component_id). With ``order_col``, survivor =
    the cluster's best row under ``order_col`` descending (e.g. a quality
    score), via a per-component window."""
    clustered = dedup_clusters(df, pairs, id_col, a_col=a_col, b_col=b_col)
    if order_col is None:
        return clustered.filter(F.col(id_col) == F.col("component_id")).drop("n_members")
    from pyspark.sql import Window

    # only MULTI-member clusters need ranking — windowing the whole corpus
    # would shuffle+sort the 100 TB side to pick rank 1 among singletons
    # that are rank 1 by construction; the near-dup fraction is tiny
    singles = clustered.filter(F.col("n_members") == 1).drop("n_members")
    multi = clustered.filter(F.col("n_members") > 1)
    w = Window.partitionBy("component_id").orderBy(order_col.desc(), F.col(id_col))
    best = (
        multi.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "n_members")
    )
    return singles.unionByName(best)


def exact_dedup_against(
    new_df: DataFrame,
    seen_df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Incremental-ingestion dedup: drop new documents whose fingerprint
    (md5 of whitespace-normalized lowercased text, the q12 exact-dup key)
    already exists in a previously-ingested corpus — LEFT ANTI join against
    the seen side's distinct fingerprints. Within-batch duplicates are a
    separate concern (:func:`exact_dedup` keeps one per fingerprint).

    Scale shape: the seen side reduces to distinct 16-byte fingerprints
    before the join (partial-aggregated); AQE broadcasts it when it fits
    and falls back to a hash join co-partitioned on the fingerprint when it
    does not — the new corpus text itself is never shuffled, only
    (row, fingerprint) through the anti probe.
    """
    seen = seen_df.select(fingerprint(F.col(text_col)).alias("_fp")).distinct()
    return (
        new_df.withColumn("_fp", fingerprint(F.col(text_col)))
        .join(seen, "_fp", "left_anti")
        .drop("_fp")
    )
