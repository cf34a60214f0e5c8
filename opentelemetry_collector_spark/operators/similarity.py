"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set against the corpus, cosine via JVM higher-order functions
  (zip_with + aggregate, sequential element order — reproducible), window
  row_number for ranking. The exact baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane LSH (SimHash for
  vectors, Charikar '02). Signatures via one Arrow-vectorized matrix multiply
  (numpy), candidates restricted to same-bucket vectors (optionally with
  multi-probe by hamming-adjacent buckets), exact cosine re-rank inside the
  bucket. At 100 TB this turns the O(N*Q) cross product into a bucketed join
  whose key distribution is uniform by construction.
- :func:`ivf_topk` — inverted-file ANN (IVF-flat, Jegou et al. '11): assign
  every vector to its nearest of ``nlist`` deterministic centroids (one
  Arrow-batched matmul), queries probe their ``nprobe`` closest lists, exact
  cosine re-rank within probed lists. With ``nprobe == nlist`` the result is
  EXACTLY brute force (the oracle gate); with ``nprobe << nlist`` the
  candidate set shrinks ~nprobe/nlist — the 100 TB path, since each list is
  a partition-pruned slice and the corpus-side assignment is a single
  narrow shuffle on ``list_id``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero vector has no direction, so its cosine is NULL
    # (under ANSI a plain divide would kill the whole job on one bad row —
    # at corpus scale a zero embedding WILL occur); NULL then fails every
    # `>= threshold` predicate and sorts after real scores in the top-k
    # windows, so downstream operators degrade per-row, never per-job.
    return F.try_divide(dot(a, b), norm(a) * norm(b))


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _cos_merge(scored: DataFrame, k: int) -> DataFrame:
    """Shared exact-cosine top-k merge: rank candidates per query, keep k,
    emit the (query_id, neighbor_id, rank, cos_milli) output contract every
    cosine server (brute force, LSH, IVF, written-index probe) shares —
    one place to change the rounding/tie-break, four call sites."""
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("cos") * 1000).cast("bigint").alias("cos_milli"),
        )
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of each query vector (self excluded).

    Output: (query_id, neighbor_id, rank, cos_milli).
    """
    from opentelemetry_collector_spark.session import spread

    # the corpus x queries scoring is the hot loop — a single-split scan
    # would run it on one core (no-op when the scan is already wide)
    c = spread(corpus).select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
    scored = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .filter(F.col("cos").isNotNull())  # zero vectors: no defined rank
    )
    return _cos_merge(scored, k)


#: fixed-point scale for hyperplane bucketing: vectors quantize to
#: floor(x * 2^20) and planes are small integers, so every plane dot is an
#: EXACT int64 — its sign (the bucket bit) is identical on any engine and
#: any summation order, which is what lets the q21 oracle replay buckets.
_PLANE_VEC_SCALE = 1 << 20


def hyperplane_planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic INTEGER hyperplane matrix (dim, n_planes): seeded
    standard normals scaled by 1000 and rounded. Integer planes sacrifice
    nothing (any full-rank matrix of random directions works for SimHash
    bucketing) and buy exact cross-engine replay — a float plane dot's
    sign can flip with summation order when the dot is near zero."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((dim, n_planes)) * 1000).astype(np.int64)


def hyperplane_signature(vec_col: Column, dim: int, n_planes: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature as a bigint bucket id.

    One numpy integer matmul per Arrow batch — no per-row Python. The
    vector quantization (floor after a power-of-two scale: exponent shift,
    no rounding) and integer planes make each bit's sign test exact —
    magnitudes stay under 2^45 (|x|*2^20 ~ 2^22-ish per coord x |plane| <=
    ~2^12 x 64 dims), far inside int64.
    """
    planes = hyperplane_planes(dim, n_planes, seed)

    @pandas_udf("long")
    def _sig(s: pd.Series) -> pd.Series:
        # NULL embeddings get a NULL bucket (a NULL join key never matches,
        # so the row silently leaves the candidate set — per-row
        # degradation, per the cosine()-NULL contract; np.vstack on a None
        # element would kill the whole job instead)
        out = pd.Series([None] * len(s), dtype="Int64")
        mask = s.notna()
        if mask.any():
            m = np.vstack(s[mask].to_numpy()).astype(np.float64)
            mq = np.floor(m * _PLANE_VEC_SCALE).astype(np.int64)
            bits = (mq @ planes) > 0  # (batch, n_planes), exact int64 dots
            weights = (1 << np.arange(n_planes)).astype(np.int64)
            out[mask.to_numpy()] = bits @ weights
        return out

    return _sig(vec_col)


def _seed_centroids(dim: int, nlist: int, seed: int) -> np.ndarray:
    """Deterministic unit centroids (seeded Gaussian) — the untrained
    fallback AND the k-means init."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((nlist, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    return cents


def _kmeanspp_init(X: np.ndarray, nlist: int, seed: int) -> np.ndarray:
    """k-means++ D^2 seeding on a (normalized) sample matrix — plain Lloyd
    from a random init collapses well-separated clusters into shared lists
    (a centroid that never wins any point is never pulled apart)."""
    rng = np.random.default_rng(seed)
    idx = [int(rng.integers(len(X)))]
    d2 = np.maximum(1.0 - X @ X[idx[0]], 0.0)
    for _ in range(1, nlist):
        total = d2.sum()
        probs = d2 / total if total > 0 else np.full(len(X), 1.0 / len(X))
        nxt = int(rng.choice(len(X), p=probs))
        idx.append(nxt)
        d2 = np.minimum(d2, np.maximum(1.0 - X @ X[nxt], 0.0))
    return X[idx].copy()


def train_centroids(
    df: DataFrame,
    dim: int,
    nlist: int,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    init_sample: int = 4096,
) -> np.ndarray:
    """Spherical k-means for the IVF coarse quantizer (k-means++ init on a
    deterministic sample, then distributed Lloyd iterations).

    Scale shape: the init reads a content-hash-ordered top-``init_sample``
    (a per-task heap merge, never a corpus sort); each Lloyd iteration is
    ONE scan with a mapInPandas kernel that assigns every vector (numpy
    matmul argmax) and emits per-TASK partial (list_id, sum_vec, count)
    rows — the map-side combine done by hand, so the data returned to the
    driver is O(nlist x dim x tasks) regardless of corpus size, and there
    is no shuffle at all. Empty lists keep their previous centroid; rows
    are re-normalized (cosine geometry). Returns a (nlist, dim) numpy array
    to pass as ``centroids=`` to the probe/index functions — the "shared
    model file" of a real deployment.
    """
    from opentelemetry_collector_spark.session import spread

    # NULL embeddings carry no training signal; filtering here keeps the
    # numpy kernels (vstack) per-row-safe on junk rows
    src = spread(df).select(as_double(F.col(vec_col)).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    sample = (
        src.withColumn("_h", F.xxhash64("_v")).orderBy("_h").limit(init_sample).toPandas()
    )
    if len(sample) >= nlist:
        X = np.vstack(sample["_v"].to_numpy()).astype(np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        C = _kmeanspp_init(X, nlist, seed)
    else:
        C = _seed_centroids(dim, nlist, seed)
    for _ in range(iters):
        bc = df.sparkSession.sparkContext.broadcast(C)

        def _partials(batches):
            cents = bc.value
            sums = np.zeros((nlist, dim), dtype=np.float64)
            counts = np.zeros(nlist, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
                mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
                lids = np.argmax(mn @ cents.T, axis=1)
                np.add.at(sums, lids, mn)
                counts += np.bincount(lids, minlength=nlist)
            yield pd.DataFrame(
                {"lid": np.arange(nlist), "s": list(sums), "n": counts}
            )

        rows = src.mapInPandas(
            _partials, "lid int, s array<double>, n bigint"
        ).toPandas()
        sums = np.zeros((nlist, dim))
        counts = np.zeros(nlist)
        for r in rows.itertuples():
            sums[r.lid] += np.asarray(r.s)
            counts[r.lid] += r.n
        nxt = C.copy()
        nonempty = counts > 0
        nxt[nonempty] = sums[nonempty] / counts[nonempty, None]
        nxt /= np.maximum(np.linalg.norm(nxt, axis=1, keepdims=True), 1e-12)
        C = nxt
        bc.destroy()
    return C


def centroid_probe(
    vec_col: Column,
    dim: int,
    nlist: int,
    nprobe: int,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    normalize: bool = True,
) -> Column:
    """IVF coarse quantizer: the ``nprobe`` nearest of ``nlist`` unit
    centroids, as an array<int> of list ids.

    One numpy matmul + argpartition per Arrow batch — no per-row Python.
    Default centroids are derived from the seed alone, so corpus assignment
    and query probing agree across jobs without a training step or a shared
    model file; pass ``centroids=`` (e.g. from :func:`train_centroids`) for
    the k-means-refined quantizer — the contract (deterministic vec->list
    assignment, both sides using the same matrix) is identical.

    ``normalize=False`` skips BOTH the per-vector and the centroid
    re-normalization and ranks by the raw inner product — the
    integer-exact serving mode: with integer-valued vectors and centroids
    every sim is an exact int64-in-double, so list assignment is
    engine-replayable (the q64 oracle) instead of depending on float
    division/sqrt rounding.
    """
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        if normalize:
            cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    else:
        cents = _seed_centroids(dim, nlist, seed)
    nprobe = min(nprobe, nlist)

    @pandas_udf("array<int>")
    def _probe(s: pd.Series) -> pd.Series:
        # NULL embeddings probe nothing (NULL list array): element_at ->
        # NULL list_id never joins; explode drops the query row — per-row
        # degradation instead of a np.vstack job kill
        out = pd.Series([None] * len(s), dtype=object)
        mask = s.notna()
        if mask.any():
            m = np.vstack(s[mask].to_numpy()).astype(np.float64)
            if normalize:
                m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cents.T  # (batch, nlist)
            # full argsort only over nlist (small); stable order for determinism
            idx = np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]
            # positional fill with plain lists: a boolean-mask assign of a
            # list of arrays trips pandas putmask, and iat squeezes a
            # length-1 ndarray to a scalar (breaking the array<int> column)
            for p, row in zip(np.flatnonzero(mask.to_numpy()), idx):
                out.iat[p] = [int(x) for x in row]
        return out

    return _probe(vec_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF-flat approximate top-k (exact when ``nprobe == nlist``).

    Corpus vectors land in exactly one inverted list (nearest centroid);
    each query probes its ``nprobe`` nearest lists and re-ranks candidates
    with exact cosine. Pairs cannot repeat (one list per corpus vector), so
    no dedup step is needed. At scale the corpus side is written partitioned
    by ``list_id`` once and every query batch prunes to nprobe/nlist of it.
    """
    from opentelemetry_collector_spark.session import spread

    c = (
        spread(corpus).select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"))
        .withColumn("list_id", F.element_at(centroid_probe(F.col("nv"), dim, nlist, 1, seed, centroids), 1))
    )
    q = (
        queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .withColumn("list_id", F.explode(centroid_probe(F.col("qv"), dim, nlist, nprobe, seed, centroids)))
    )
    cand = c.join(F.broadcast(q), on="list_id").filter(F.col("nid") != F.col("qid"))
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("nv"))).filter(
        F.col("cos").isNotNull()
    )
    return _cos_merge(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: union of n_tables independent hyperplane tables,
    bucket join, exact cosine re-rank within candidates.

    Recall grows with n_tables (each table is an independent chance for a
    true neighbor to collide); cost stays ~N*n_tables bucket rows.
    """
    from opentelemetry_collector_spark.session import spread

    if n_tables < 1:
        raise ValueError(f"n_tables must be >= 1, got {n_tables}")
    c = spread(corpus).select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
    cand = None
    for t in range(n_tables):
        cs = c.withColumn("bucket", hyperplane_signature(F.col("nv"), dim, n_planes, seed=42 + t))
        qs = q.withColumn("bucket", hyperplane_signature(F.col("qv"), dim, n_planes, seed=42 + t))
        j = cs.join(F.broadcast(qs), on="bucket").filter(F.col("nid") != F.col("qid")).select(
            "qid", "qv", "nid", "nv"
        )
        cand = j if cand is None else cand.unionByName(j)
    cand = cand.dropDuplicates(["qid", "nid"])
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("nv"))).filter(
        F.col("cos").isNotNull()
    )
    return _cos_merge(scored, k)


def ivf_write_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> None:
    """Materialize the IVF inverted lists as a parquet table PARTITIONED BY
    list_id — the build step of a real ANN serving path. Each corpus vector
    lands in exactly one hive partition; probes then read nprobe/nlist of
    the files (partition pruning), which is what makes IVF sublinear at
    100 TB: the index is built once, every query batch scans only its lists."""
    from opentelemetry_collector_spark.session import spread

    # spread: the assignment matmul is the build's hot loop — a single-file
    # scan would run it (and write every list) from one task
    c = (
        spread(corpus).select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"))
        .withColumn("list_id", F.element_at(centroid_probe(F.col("nv"), dim, nlist, 1, seed, centroids), 1))
    )
    c.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Probe a written IVF index: resolve the query batch's probe lists
    (tiny driver action — the query set is small by definition), push them
    as a LITERAL partition filter so the parquet scan statically prunes to
    nprobe/nlist of the index files, then exact-cosine re-rank.

    Same centroids as :func:`ivf_write_index` (seed-derived), so results are
    identical to the in-memory :func:`ivf_topk` with the same parameters."""
    q = (
        queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .withColumn("list_id", F.explode(centroid_probe(F.col("qv"), dim, nlist, nprobe, seed, centroids)))
    )
    # the probe-list resolve recomputes the (tiny by definition) query frame
    # once rather than persisting it — a persist here has no second heavy
    # use and would pin block-manager storage for the session lifetime
    probe_ids = sorted({r.list_id for r in q.select("list_id").distinct().collect()})
    idx = spark.read.parquet(path).filter(F.col("list_id").isin(probe_ids))
    cand = idx.join(F.broadcast(q), on="list_id").filter(F.col("nid") != F.col("qid"))
    scored = cand.withColumn("cos", cosine(F.col("qv"), F.col("nv"))).filter(
        F.col("cos").isNotNull()
    )
    return _cos_merge(scored, k)


# --- product quantization: the memory-bound scale path ----------------------
#
# IVF prunes WORK (fewer candidates); PQ prunes BYTES: a dim-D float vector
# becomes m uint8 codes (D*4 bytes -> m bytes, e.g. 64 floats -> 8 bytes),
# which is what makes a 100 TB embedding table servable from executor
# memory. Inner-product PQ over L2-normalized vectors: per-subspace
# codebooks quantize the vector, a query scores candidates via an
# asymmetric-distance lookup table (LUT) of subspace dot products —
# Jegou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011. No reference counterpart (SURVEY §2.7 Spark-side surface).


def train_pq(
    df: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    seed: int = 42,
    vec_col: str = "embedding",
    init_sample: int = 4096,
    normalize: bool = True,
) -> np.ndarray:
    """Train per-subspace PQ codebooks; returns (m, ksub, dim/m) numpy.

    Same distribution contract as :func:`train_centroids`: k-means++ init
    per subspace on one content-hash-ordered sample, then Lloyd iterations
    where ONE mapInPandas scan assigns every vector in ALL m subspaces and
    emits per-task partial (subspace, code, sum, count) rows — O(m x ksub x
    dsub x tasks) back to the driver per iteration, zero shuffles.
    """
    from opentelemetry_collector_spark.session import spread

    if dim % m:
        raise ValueError(f"dim {dim} must divide into m={m} subspaces")
    dsub = dim // m
    # NULL-filter for the same per-row-safety reason as train_centroids
    src = spread(df).select(as_double(F.col(vec_col)).alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    sample = (
        src.withColumn("_h", F.xxhash64("_v")).orderBy("_h").limit(init_sample).toPandas()
    )
    if len(sample):
        X = np.vstack(sample["_v"].to_numpy()).astype(np.float64)
        if normalize:
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    else:  # empty corpus: every subspace falls to the seeded-random branch
        X = np.zeros((0, dim))
    rng = np.random.default_rng(seed)
    books = np.zeros((m, ksub, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        if len(S) >= ksub:
            # k-means++ D^2 seeding in plain L2 (subvectors are not unit)
            idx = [int(rng.integers(len(S)))]
            d2 = ((S - S[idx[0]]) ** 2).sum(axis=1)
            for _ in range(1, ksub):
                tot = d2.sum()
                p = d2 / tot if tot > 0 else np.full(len(S), 1.0 / len(S))
                nxt = int(rng.choice(len(S), p=p))
                idx.append(nxt)
                d2 = np.minimum(d2, ((S - S[nxt]) ** 2).sum(axis=1))
            books[j] = S[idx]
        else:
            books[j] = rng.standard_normal((ksub, dsub)) / np.sqrt(dim)

    for _ in range(iters):
        bc = df.sparkSession.sparkContext.broadcast(books)

        def _partials(batches):
            B = bc.value
            sums = np.zeros((m, ksub, dsub))
            counts = np.zeros((m, ksub), dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.vstack(pdf["_v"].to_numpy()).astype(np.float64)
                if normalize:
                    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
                for j in range(m):
                    S = V[:, j * dsub : (j + 1) * dsub]
                    # ||s-c||^2 argmin == argmax(s.c - ||c||^2/2)
                    scores = S @ B[j].T - 0.5 * (B[j] ** 2).sum(axis=1)
                    code = np.argmax(scores, axis=1)
                    np.add.at(sums[j], code, S)
                    counts[j] += np.bincount(code, minlength=ksub)
            out = pd.DataFrame(
                {
                    "j": np.repeat(np.arange(m), ksub),
                    "c": np.tile(np.arange(ksub), m),
                    "s": [v for j in range(m) for v in sums[j]],
                    "n": counts.reshape(-1),
                }
            )
            yield out

        rows = src.mapInPandas(_partials, "j int, c int, s array<double>, n bigint").toPandas()
        sums = np.zeros((m, ksub, dsub))
        counts = np.zeros((m, ksub))
        for r in rows.itertuples():
            sums[r.j, r.c] += np.asarray(r.s)
            counts[r.j, r.c] += r.n
        nxt = books.copy()
        ne = counts > 0
        nxt[ne] = sums[ne] / counts[ne][:, None]
        books = nxt
        bc.destroy()
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """(id, pq_code array<int>) — each L2-normalized vector's per-subspace
    nearest-codeword indices. One numpy pass per Arrow batch; at scale this
    table is what gets persisted (m bytes/vector), not the floats."""
    enc = _pq_code_udf(np.asarray(codebooks, dtype=np.float64), normalize)
    return df.select(F.col(id_col).alias("nid"), enc(as_double(F.col(vec_col))).alias("pq_code"))


def _resolve_centroids(
    dim: int, nlist: int, seed: int, centroids: np.ndarray | None
) -> np.ndarray:
    """Shared coarse-quantizer resolve: trained matrix (re-normalized) or
    the seed-derived fallback — every IVF/PQ entry point must agree."""
    if centroids is None:
        return _seed_centroids(dim, nlist, seed)
    cents = np.asarray(centroids, dtype=np.float64)
    return cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)


def _pq_code_udf(B: np.ndarray, normalize: bool = True):
    """Arrow-batched encoder: L2-normalize, per-subspace nearest codeword.
    A zero vector has no direction (the cosine()-NULL contract), so it
    encodes to NULL rather than an arbitrary min-norm codeword.
    ``normalize=False`` scores raw vectors — with integer-valued inputs
    and codebooks every score is exact (dyadic halves), so assignment
    tie-breaks (argmax -> lowest code) replay in SQL."""
    m, ksub, dsub = B.shape

    @pandas_udf("array<int>")
    def _enc(s: pd.Series) -> pd.Series:
        # NULL embeddings encode to NULL like zero vectors do (the scorer
        # already drops NULL codes per row); vstack on a None would kill
        # the whole encode job
        out = pd.Series([None] * len(s), dtype=object)
        mask = s.notna()
        if not mask.any():
            return out
        V = np.vstack(s[mask].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        if normalize:
            V = V / np.maximum(norms, 1e-12)
        codes = np.empty((len(V), m), dtype=np.int32)
        for j in range(m):
            S = V[:, j * dsub : (j + 1) * dsub]
            scores = S @ B[j].T - 0.5 * (B[j] ** 2).sum(axis=1)
            codes[:, j] = np.argmax(scores, axis=1)
        # positional fill with plain lists (see centroid_probe: mask assign
        # and raw-ndarray iat both misbehave)
        for p, c, nz in zip(np.flatnonzero(mask.to_numpy()), codes, norms[:, 0] > 0.0):
            out.iat[p] = [int(x) for x in c] if nz else None
        return out

    return _enc


def _pq_query_tensors(
    queries: DataFrame, B: np.ndarray, id_col: str, vec_col: str, normalize: bool = True
):
    """Driver-side query prep shared by the PQ servers: sorted ids, the
    normalized query matrix, and the (q, m, ksub) dot-product LUT tensor.
    Zero-norm queries are dropped (no direction -> no defined neighbors,
    matching cosine_topk, which ranks nothing for them)."""
    m, ksub, dsub = B.shape
    qp = (
        queries.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
        .toPandas()
        .sort_values("qid")
    )
    if len(qp):
        mat = np.vstack(qp["qv"].to_numpy()).astype(np.float64)
        keep = np.linalg.norm(mat, axis=1) > 0.0
        qp, mat = qp[keep], mat[keep]
    if not len(qp):
        return None
    qids = qp["qid"].to_numpy()
    Q = mat / np.linalg.norm(mat, axis=1, keepdims=True) if normalize else mat
    lut = np.einsum("qjd,jcd->qjc", Q.reshape(len(Q), m, dsub), B)
    return qids, Q, lut


def _pq_scorer(qids: np.ndarray, lut: np.ndarray, k: int, probes: np.ndarray | None):
    """The ONE mapInPandas scoring kernel behind all three PQ servers:
    per query, mask self and (when probing) non-probed lists BEFORE the
    local top-k truncation — truncate-then-filter would silently drop the
    true k-th neighbor whenever self lands in a batch's local winners."""
    m = lut.shape[1]

    def _score(batches):
        for pdf in batches:
            pdf = pdf[pdf["pq_code"].notna()]
            if not len(pdf):
                continue
            C = np.vstack(pdf["pq_code"].to_numpy()).astype(np.int64)
            nid = pdf["nid"].to_numpy()
            lid = pdf["list_id"].to_numpy() if probes is not None else None
            for qi in range(len(qids)):
                mask = nid != qids[qi]
                if probes is not None:
                    mask &= np.isin(lid, probes[qi])
                if not mask.any():
                    continue
                Cq, nq_ids = C[mask], nid[mask]
                S = np.zeros(len(Cq))
                for j in range(m):
                    S += lut[qi, j, Cq[:, j]]
                order = np.lexsort((nq_ids, -S))[: min(k, len(Cq))]
                yield pd.DataFrame(
                    {"qid": qids[qi], "nid": nq_ids[order], "score": S[order]}
                )

    return _score


def _pq_merge(scored: DataFrame, k: int) -> DataFrame:
    """Global top-k merge over per-task local winners (WindowGroupLimit)."""
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.col("rank").cast("int").alias("rank"),
            F.floor(F.col("score") * 1000).cast("bigint").alias("approx_milli"),
        )
    )


def _pq_schemas(id_dtype: str) -> tuple[str, str]:
    """(scored, empty-result) schemas with the caller's id type preserved —
    hardcoding `long` would ArrowTypeError any string-id corpus that every
    non-PQ top-k accepts."""
    return (
        f"qid {id_dtype}, nid {id_dtype}, score double",
        f"query_id {id_dtype}, neighbor_id {id_dtype}, rank int, approx_milli bigint",
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoded: DataFrame | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Approximate top-k by asymmetric distance: queries (small, collected
    to a broadcast LUT tensor) score the ENCODED corpus — bytes, not floats
    — with per-batch numpy gathers, emitting only each task's local top-k;
    the global WindowGroupLimit merge then sees O(k x queries x tasks) rows.

    Scale shape: the corpus-side input is the m-byte code table (32x
    smaller than float32 vectors at dim 64 / m 8); no join, no shuffle of
    vectors — one mapInPandas over codes plus the k-row-per-query merge.
    """
    from opentelemetry_collector_spark.session import spread

    B = np.asarray(codebooks, dtype=np.float64)
    scored_schema, empty_schema = _pq_schemas(dict(queries.dtypes)[id_col])
    enc = (
        encoded
        if encoded is not None
        else pq_encode(spread(corpus), B, id_col, vec_col, normalize)
    )
    prep = _pq_query_tensors(queries, B, id_col, vec_col, normalize)
    if prep is None:  # no (directed) queries: empty result, output schema
        return corpus.sparkSession.createDataFrame([], empty_schema)
    qids, _, lut = prep
    score = _pq_scorer(qids, lut, k, probes=None)
    return _pq_merge(enc.mapInPandas(score, scored_schema), k)


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    codebooks: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
) -> DataFrame:
    """IVF candidate pruning composed with PQ byte scoring — the standard
    billion-scale serving shape (FAISS IVFPQ): the corpus reduces ONCE to
    (id, list_id, m-byte code) rows (assignment and encoding in the same
    pass over the floats); each query probes its ``nprobe`` nearest lists
    and LUT-scores only those lists' codes. With ``nprobe == nlist`` the
    result equals :func:`pq_topk` exactly (pruning removes nothing).

    Scale shape: serving touches bytes only; the per-batch probe-list mask
    here stands in for the static partition pruning a list_id-partitioned
    written code table gives (:func:`pq_probe_index`).
    """
    from opentelemetry_collector_spark.session import spread

    B = np.asarray(codebooks, dtype=np.float64)
    if normalize:
        cents = _resolve_centroids(dim, nlist, seed, centroids)
    else:
        cents = np.asarray(centroids, dtype=np.float64)
    nprobe = min(nprobe, nlist)
    src = spread(corpus).select(
        F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("_v")
    )
    enc = src.select(
        "nid",
        F.element_at(
            centroid_probe(F.col("_v"), dim, nlist, 1, seed, cents, normalize), 1
        ).alias("list_id"),
        _pq_code_udf(B, normalize)(F.col("_v")).alias("pq_code"),
    )
    scored_schema, empty_schema = _pq_schemas(dict(queries.dtypes)[id_col])
    prep = _pq_query_tensors(queries, B, id_col, vec_col, normalize)
    if prep is None:
        return corpus.sparkSession.createDataFrame([], empty_schema)
    qids, Q, lut = prep
    # probe lists with the same stable-argsort math as centroid_probe
    probes = np.argsort(-(Q @ cents.T), kind="stable", axis=1)[:, :nprobe]
    score = _pq_scorer(qids, lut, k, probes)
    return _pq_merge(enc.mapInPandas(score, scored_schema), k)


def pq_write_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    codebooks: np.ndarray,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> None:
    """Materialize the IVF-PQ index: (id, pq_code) rows PARTITIONED BY
    list_id — the byte-sized build artifact of the billion-scale serving
    path. The floats are read exactly once (assignment + encoding in one
    projection) and never stored: at dim 64 / m 8 the written index is ~32x
    smaller than the raw embedding table, which is what lets every probe's
    working set live in page cache."""
    from opentelemetry_collector_spark.session import spread

    B = np.asarray(codebooks, dtype=np.float64)
    cents = _resolve_centroids(dim, nlist, seed, centroids)
    # spread for the same single-task-build reason as ivf_write_index
    src = spread(corpus).select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("_v"))
    enc = src.select(
        "nid",
        F.element_at(centroid_probe(F.col("_v"), dim, nlist, 1, seed, cents), 1).alias("list_id"),
        _pq_code_udf(B)(F.col("_v")).alias("pq_code"),
    )
    enc.write.mode("overwrite").partitionBy("list_id").parquet(path)


def pq_probe_index(
    spark,
    path: str,
    queries: DataFrame,
    dim: int,
    codebooks: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Serve approximate top-k from a written IVF-PQ index: the query
    batch's probe lists become a LITERAL partition filter (static pruning to
    nprobe/nlist of the code files), then the broadcast LUT tensor scores
    the surviving bytes with per-task local top-k before the global merge.
    Same centroids/codebooks as :func:`pq_write_index`, so results equal
    the in-memory :func:`ivf_pq_topk` with identical parameters."""
    B = np.asarray(codebooks, dtype=np.float64)
    cents = _resolve_centroids(dim, nlist, seed, centroids)
    nprobe = min(nprobe, nlist)
    scored_schema, empty_schema = _pq_schemas(dict(queries.dtypes)[id_col])
    prep = _pq_query_tensors(queries, B, id_col, vec_col)
    if prep is None:
        return spark.createDataFrame([], empty_schema)
    qids, Q, lut = prep
    probes = np.argsort(-(Q @ cents.T), kind="stable", axis=1)[:, :nprobe]
    probe_ids = sorted({int(x) for x in probes.reshape(-1)})
    idx = spark.read.parquet(path).filter(F.col("list_id").isin(probe_ids))
    score = _pq_scorer(qids, lut, k, probes)
    scored = idx.select("nid", "list_id", "pq_code").mapInPandas(score, scored_schema)
    return _pq_merge(scored, k)


def assign_clusters(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str | None = None,
    cent_vec_col: str | None = None,
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid by cosine —
    the cluster-assignment step of SemDeDup-style pipelines (Abbas et al.
    2023 cluster their corpus before deduping within clusters) and the
    input to cluster-balance mixing reports. Unlike :func:`centroid_probe`
    (trained numpy centroids, IVF serving), the centroids here are an
    EXPLICIT DataFrame of rows — e.g. curated anchor documents — so the
    whole assignment stays declarative and oracle-checkable.

    Output: (id_col, cluster_id, cos_milli). Deterministic tie-break:
    highest cosine, then smallest centroid id (any orderable id type —
    the argmax is ``min(struct(-cos, cid))``, a map-side partial agg, not
    a corpus-wide window). Vectors with no defined cosine against any
    centroid (zero/NULL vectors) are dropped, per the repo's per-row junk
    policy.

    Scale shape: the centroid frame is tiny and broadcast; the corpus is
    scanned once, scored k times per row map-side, and the argmax
    partial-aggregates before the single groupBy exchange on id.
    """
    cent_id = cent_id_col or id_col
    cent_vec = cent_vec_col or vec_col
    c = centroids.select(
        F.col(cent_id).alias("_cid"), as_double(F.col(cent_vec)).alias("_cv")
    )
    v = corpus.select(F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("_vv"))
    scored = (
        v.join(F.broadcast(c))
        .withColumn("_cos", cosine(F.col("_vv"), F.col("_cv")))
        .filter(F.col("_cos").isNotNull() & ~F.isnan(F.col("_cos")))
    )
    best = scored.groupBy("_vid").agg(
        F.min(F.struct((-F.col("_cos")).alias("_nc"), F.col("_cid"))).alias("_b")
    )
    return best.select(
        F.col("_vid").alias(id_col),
        F.col("_b._cid").alias("cluster_id"),
        F.floor(-F.col("_b._nc") * 1000).cast("bigint").alias("cos_milli"),
    )


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    tau_pm: int = 500,
    max_df: int | None = None,
) -> DataFrame:
    """All-pairs TF-IDF cosine similarity over TEXT (the embedding-free
    near-dup/similarity path — Bayardo et al. WWW'07's problem, solved with
    the posting-list join): every document pair whose tf-idf cosine clears
    ``tau_pm`` per-mille, integer-exact so an oracle can replay it.

    Exactness trick: idf at WHOLE-BIT resolution (``length(bin(N)) -
    length(bin(doc_freq))``, the :func:`~opentelemetry_collector_spark.
    operators.text.surprisal_bits` technique) keeps weights integral, and
    the threshold test ``dot/sqrt(n1*n2) >= tau/1000`` becomes the exact
    cross-multiplication ``dot^2 * 10^6 >= tau_pm^2 * n1 * n2`` in
    DECIMAL(38,0) — no sqrt, no float anywhere. Weights are
    ``tf * (idf_bits + 1)`` (the +1 keeps a term present in every document
    from zeroing out, the usual idf smoothing). The output carries the
    exact integers (dot, both squared norms); a display cosine is one
    float division away for callers, but keeping it out of the contract
    keeps the result hash-stable unconditionally.

    Scale shape: postings explode once; ``max_df`` drops ultra-common
    terms BEFORE the self-join (the standard all-pairs pruning — a term in
    f docs contributes f^2 candidate pairs, so stopword-frequency terms are
    the quadratic blowup); the pair aggregation is one partial-aggregated
    groupBy keyed (doc1, doc2). Candidate count is sum_t df_t^2 — bounded
    by construction, never |docs|^2.
    """
    if not 0 < tau_pm <= 1000:
        raise ValueError("tau_pm must be in (0, 1000]")
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.when(
                F.length(F.trim(F.col(text_col))) == 0,
                F.array().cast("array<string>"),
            ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("_t"),
    )
    tf = toks.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("_tf"))
    n_docs = df.select(id_col).distinct().count()
    # empty corpus -> no postings -> no pairs; max_bits only shapes weights
    max_bits = len(bin(n_docs)) - 2 if n_docs else 0
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("_df") <= max_df)
    posts = tf.join(dfreq, "_t").select(
        "_t",
        "_id",
        (F.col("_tf") * (F.lit(max_bits) - F.length(F.bin("_df")) + 1)).alias("_w"),
    )
    norms = posts.groupBy("_id").agg(F.sum(F.col("_w") * F.col("_w")).alias("_n2"))
    a = posts.select(F.col("_t"), F.col("_id").alias("id_a"), F.col("_w").alias("_wa"))
    b = posts.select(F.col("_t"), F.col("_id").alias("id_b"), F.col("_w").alias("_wb"))
    dots = (
        a.join(b, "_t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("_dot"))
    )
    paired = (
        dots.join(norms.withColumnRenamed("_id", "id_a").withColumnRenamed("_n2", "_na"), "id_a")
        .join(norms.withColumnRenamed("_id", "id_b").withColumnRenamed("_n2", "_nb"), "id_b")
    )
    dec = "decimal(38,0)"
    flag = (
        F.col("_dot").cast(dec) * F.col("_dot").cast(dec) * F.lit(1_000_000).cast(dec)
        >= F.lit(int(tau_pm) ** 2).cast(dec) * F.col("_na").cast(dec) * F.col("_nb").cast(dec)
    )
    return paired.filter(flag).select(
        "id_a",
        "id_b",
        F.col("_dot").cast("bigint").alias("dot"),
        F.col("_na").cast("bigint").alias("norm2_a"),
        F.col("_nb").cast("bigint").alias("norm2_b"),
    )


def fuzzy_prefix_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    block_len: int = 6,
    key_len: int = 24,
    max_dist: int = 10,
) -> DataFrame:
    """Fuzzy near-match pairs by edit distance over a fixed text prefix,
    with prefix blocking (the string-similarity-join analog of the LSH
    band trick): candidate pairs share their first ``block_len`` chars, so
    the self-join is an EQUI join on the block key — never a cross join —
    and the quadratic blowup is bounded per block, exactly like a band
    bucket. ``levenshtein`` (unit-cost edit distance) is built-in and
    integer-exact on every engine, so the pair set is oracle-checkable.

    Note the same recall caveat as any blocking scheme: an edit inside the
    first ``block_len`` chars moves the row to another block (LSH bands
    have the same one-sided error; raise recall with shorter blocks or
    multiple offset blocks, at candidate-count cost).
    """
    if max_dist < 0 or block_len < 1 or key_len < block_len:
        raise ValueError("need key_len >= block_len >= 1 and max_dist >= 0")
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, block_len).alias("_blk"),
        F.substring(F.col(text_col), 1, key_len).alias("_key"),
    )
    a = keyed.select(
        F.col("_blk"),
        F.col("_id").alias("id_a"),
        F.col("_key").alias("_key_a"),
    )
    b = keyed.select(
        F.col("_blk"),
        F.col("_id").alias("id_b"),
        F.col("_key").alias("_key_b"),
    )
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_key_a", "_key_b").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= max_dist)
    )


def pool_embeddings(
    df: DataFrame,
    keys: list[str],
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Element-wise mean of embedding vectors per key, in EXACT integer
    micro-units — the centroid/pooling step behind cluster summaries,
    class prototypes, and conversation-level embeddings. Float averaging
    is partitioning-dependent (non-associative adds); quantizing each
    element to ``floor(v * scale)`` first makes the sum associative and
    the result bit-identical on any engine or shuffle order (the same
    integer-currency trick as the PageRank/OHLC operators).

    Physical shape mirrors :func:`aggregate.histogram_merge`: posexplode →
    partial-aggregated groupBy(keys, pos) — the corpus-sized shuffle
    spreads each key over dim reduce groups (no hot reducer even for a
    dominant key) — then one small per-key rebuild via sorted struct
    collect. NULL vectors drop per-row; ragged dims average per-position
    over the vectors that HAVE that position (count rides per position).

    Returns (keys..., n_vectors, centroid_micros array<bigint>).
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not keys:
        raise ValueError("at least one key column is required")
    pe = (
        df.filter(F.col(vec_col).isNotNull())
        .select(*keys, F.posexplode(F.col(vec_col)).alias("_pos", "_v"))
        .select(
            *keys,
            "_pos",
            F.floor(F.col("_v").cast("double") * F.lit(int(scale))).cast("bigint").alias("_q"),
        )
    )
    per_pos = pe.groupBy(*keys, "_pos").agg(
        F.sum("_q").alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    return per_pos.groupBy(*keys).agg(
        F.max("_n").cast("bigint").alias("n_vectors"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", F.expr("_s div _n").alias("_m")))),
            lambda s: s["_m"],
        ).alias("centroid_micros"),
    )


def contrastive_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k_hard: int = 5,
    n_random: int = 3,
    dup_milli: int = 950,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Negative mining for contrastive / embedding training (the data-prep
    dual of :func:`cosine_topk`): per anchor, the ``k_hard`` most-similar
    vectors below the near-duplicate bar (hard negatives — informative
    because they are close) plus ``n_random`` deterministic random
    negatives drawn md5-uniformly from the remaining pool (the easy
    contrast). Vectors at or above ``dup_milli`` cosine-milli are excluded
    from BOTH pools: a near-duplicate used as a negative is a false
    negative that poisons the loss.

    Output: (anchor_id, neighbor_id, kind 'hard'|'random', rank,
    cos_milli). Deterministic end-to-end: cosine ties break on
    neighbor_id, random picks are md5(anchor:neighbor) order — both
    engine-replayable (the q16/q43 conventions).

    Scale shape: anchors broadcast against the corpus scan (one pass
    scores everything); both rank filters are ``row_number() <= k`` alone
    in their window, so Spark rewrites them to Partial WindowGroupLimit —
    each map task forwards at most k rows per anchor and the shuffle is
    O(k x anchors), never corpus-sized. The hard-set anti-join is
    (k_hard x anchors) rows — AQE broadcasts it.
    """
    if k_hard <= 0 or n_random < 0:
        raise ValueError(f"k_hard must be positive, n_random non-negative: {k_hard}, {n_random}")
    from opentelemetry_collector_spark.session import spread

    c = spread(corpus).select(F.col(id_col).alias("nid"), as_double(F.col(vec_col)).alias("nv"))
    q = anchors.select(F.col(id_col).alias("qid"), as_double(F.col(vec_col)).alias("qv"))
    scored = (
        c.join(F.broadcast(q), F.col("nid") != F.col("qid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
        .filter(F.col("cos").isNotNull())
        .withColumn("cos_milli", F.floor(F.col("cos") * 1000).cast("bigint"))
        .filter(F.col("cos_milli") < F.lit(dup_milli))
    )
    w_hard = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    hard = (
        scored.withColumn("rank", F.row_number().over(w_hard))
        .filter(F.col("rank") <= k_hard)
        .select("qid", "nid", "rank", "cos_milli")
    )
    pool = scored.join(hard.select("qid", "nid"), ["qid", "nid"], "left_anti")
    md5_key = F.md5(
        F.concat(F.col("qid").cast("string"), F.lit(":"), F.col("nid").cast("string"))
    )
    w_rnd = Window.partitionBy("qid").orderBy(md5_key.asc(), F.col("nid").asc())
    rnd = (
        pool.withColumn("rank", F.row_number().over(w_rnd))
        .filter(F.col("rank") <= n_random)
        .select("qid", "nid", "rank", "cos_milli")
    )
    out_cols = [
        F.col("qid").alias("anchor_id"),
        F.col("nid").alias("neighbor_id"),
        F.col("kind"),
        F.col("rank").cast("int").alias("rank"),
        F.col("cos_milli"),
    ]
    return (
        hard.withColumn("kind", F.lit("hard"))
        .select(*out_cols)
        .unionByName(rnd.withColumn("kind", F.lit("random")).select(*out_cols))
    )
