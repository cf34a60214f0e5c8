"""Mergeable probabilistic sketches: Bloom filter and Count-Min.

The reference scales membership/frequency questions by keeping *all* state in
one process (the Prometheus accumulator's full per-series map,
``exporter/prometheusexporter/accumulator.go:65-132``; the logdedup-style
first-occurrence maps). At 100 TB neither "ship the full seen-set to every
task" nor "shuffle the corpus per question" survives — the scale path is a
FIXED-SIZE mergeable summary built with one partial-aggregated pass and
probed at scan speed as a pure projection.

Three sketches, all exact-integer and engine-portable (DuckDB replays the
identical md5 double-hashing / integer rank rules, so the driver's oracle
gate value-checks them):

- **Bloom filter** (Bloom 1970; Kirsch-Mitzenmacher double hashing, ESA'06):
  ``k`` bit positions per key from two independent 52-bit md5 words,
  ``pos_i = (h1 + i*h2) mod m``. Built as an (word, bits) integer frame —
  mergeable by ``bit_or`` — and probed as a zero-shuffle projection against
  the collected bitset (sketch-sized by construction, like a broadcast var).
  Use: incremental cross-corpus dedup pre-filter — only ``maybe_seen``
  survivors pay the exact verification join (no false negatives, so rows the
  bloom clears never shuffle at all).

- **Histogram-quantile** (the mergeable fixed-boundary form of the OTLP
  explicit-bounds Histogram, ``model/pdata/metrics.go:129-141``): per-key
  (bucket, cnt) cells bounded by |keys| * buckets, merged by cell sum;
  quantile = upper bound of the first bucket reaching the integer ceiling
  rank. Use: latency quantiles at the scale where exact percentiles
  (q53) would shuffle every measurement.

- **Count-Min** (Cormode & Muthukrishnan 2005): ``depth`` rows of ``width``
  counters, cell ``(r, (h1 + r*h2) mod width) += w``; estimate = min over
  rows, always >= the true count. Built with one partial-aggregated groupBy
  over (row, col) — the shuffle is ``depth*width`` cells regardless of input
  size — and probed as a projection. Use: heavy-hitter / skewed-key
  detection (the salting decision's input) without a full per-key groupBy.

Hashing parity: Spark ``conv(substring(md5(x),1,13),16,10)`` ==
DuckDB ``('0x' || substring(md5(x),1,13))::UBIGINT`` (52 bits, exact in
BIGINT); the second word reads hex chars 14-26. Bits live in 32-bit words
stored as BIGINT so no mask ever touches the sign bit in either engine.
"""

from __future__ import annotations

try:  # only the *_big Arrow probes need pandas; keep the module importable
    import pandas as pd
except ImportError:  # pragma: no cover - pandas ships with this container
    pd = None
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32
_MAX_COLLECT_CELLS = 1 << 22  # collected-sketch guard: 4M longs ~ 32 MB


_MASK_52 = (1 << 52) - 1


def _hash_words(key: Column, hasher: str = "md5") -> tuple[Column, Column]:
    """Two independent 52-bit non-negative words of hash(key) as BIGINT.

    ``md5`` (default): hex chars 1-13 / 14-26 via ``conv`` — byte-identical
    in DuckDB, so oracle queries replay the sketch. ``xxhash64``: two seeded
    native hashes masked to 52 bits — ~10x cheaper per row (no hex
    stringify/parse), Spark-only; the production setting when no
    cross-engine replay is needed. Both keep every downstream sum
    ``h1 + k*h2`` comfortably inside the BIGINT range.

    xxhash64 hashes a NULL input to the seed hash rather than NULL, which
    would give NULL keys a phantom membership — the explicit isNotNull gate
    preserves the md5 behavior (NULL carries no hash).
    """
    if hasher == "md5":
        h = F.md5(key.cast("string"))
        h1 = F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")
        h2 = F.conv(F.substring(h, 14, 13), 16, 10).cast("bigint")
        return h1, h2
    if hasher == "xxhash64":
        guard = key.isNotNull()
        h1 = F.when(guard, F.xxhash64(key, F.lit(1)).bitwiseAND(F.lit(_MASK_52)))
        h2 = F.when(guard, F.xxhash64(key, F.lit(2)).bitwiseAND(F.lit(_MASK_52)))
        return h1, h2
    raise ValueError(f"unknown hasher: {hasher!r} (md5 | xxhash64)")


def _positions(key: Column, k: int, modulus: int, hasher: str = "md5") -> Column:
    """Array of k double-hashed positions in [0, modulus)."""
    h1, h2 = _hash_words(key, hasher)
    return F.array(*[(h1 + F.lit(i) * h2) % F.lit(modulus) for i in range(k)])


_MASKS = [1 << b for b in range(_WORD_BITS)]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 3, hasher: str = "md5"
) -> DataFrame:
    """One-pass Bloom build: (word, bits) frame, m_bits/32 rows max.

    Mergeable: union two builds and ``groupBy(word).agg(bit_or(bits))`` —
    asserted equal to building over the union in test_sketches. NULL keys
    carry no membership and are skipped. The groupBy's partial aggregation
    collapses each task to <= m_bits/32 rows before the (tiny) shuffle.
    """
    if m_bits % _WORD_BITS:
        raise ValueError(f"m_bits must be a multiple of {_WORD_BITS}: {m_bits}")
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8]: {k}")
    masks = F.array(*[F.lit(m).cast("bigint") for m in _MASKS])
    pos = F.explode(_positions(F.col(key_col), k, m_bits, hasher)).alias("pos")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / _WORD_BITS).cast("int").alias("word"),
            F.get(masks, (F.col("pos") % _WORD_BITS).cast("int")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """bit_or-merge same-shaped builds (the cross-batch accumulation path)."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    out_col: str = "maybe_seen",
    hasher: str = "md5",
) -> DataFrame:
    """Zero-shuffle membership probe: the built bloom is collected (it is
    sketch-sized by construction) and evaluated as a pure projection — k
    ``get()`` lookups into a literal dense bitset per row, no join, no
    explode, no exchange (plan asserted in test_sketches). No false
    negatives ever; NULL keys probe false."""
    n_words = m_bits // _WORD_BITS
    if n_words > _MAX_COLLECT_CELLS:
        raise ValueError(f"m_bits {m_bits} too large to collect ({n_words} words)")
    dense = [0] * n_words
    for r in bloom.collect():
        dense[r["word"]] = r["bits"]
    arr = F.array(*[F.lit(v).cast("bigint") for v in dense])
    pos = _positions(F.col(key_col), k, m_bits, hasher)
    hits = [
        (
            F.get(arr, (F.get(pos, i) / _WORD_BITS).cast("int")).bitwiseAND(
                F.get(F.array(*[F.lit(m).cast("bigint") for m in _MASKS]),
                      (F.get(pos, i) % _WORD_BITS).cast("int"))
            )
            > 0
        )
        for i in range(k)
    ]
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    return df.withColumn(out_col, F.coalesce(flag, F.lit(False)))


def bloom_probe_big(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    out_col: str = "maybe_seen",
    hasher: str = "md5",
) -> DataFrame:
    """Scale form of :func:`bloom_probe` for bitsets too large to inline as
    a literal array (the literal form pays one py4j round-trip per word —
    fine at 2^16 bits, minutes at 2^26). The dense word array ships ONCE
    per executor as a Spark broadcast (numpy int64, m_bits/8 bytes) and the
    probe is an Arrow-batched pandas UDF doing k vectorized bit tests; the
    double-hash words are still computed JVM-side (md5 substrings), so no
    Python ever touches the key bytes. Identical verdicts to
    :func:`bloom_probe` (asserted in test_sketches); NULL keys probe False.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if pd is None:  # pragma: no cover
        raise ImportError("pandas is required for the Arrow-batched sketch probes")
    n_words = m_bits // _WORD_BITS
    if n_words > _MAX_COLLECT_CELLS:
        raise ValueError(f"m_bits {m_bits} too large to collect ({n_words} words)")
    dense = np.zeros(n_words, dtype=np.int64)
    # Arrow collect: a 2^26-bit bloom is 2M (word, bits) rows — materializing
    # them as driver Row objects costs ~20x the Arrow columnar transfer
    pdf = bloom.toPandas()
    dense[pdf["word"].to_numpy(dtype=np.int64)] = pdf["bits"].to_numpy(dtype=np.int64)
    bc = df.sparkSession.sparkContext.broadcast(dense)

    @pandas_udf("boolean")
    def _probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        words = bc.value
        null = h1.isna().to_numpy()
        a = h1.fillna(0).to_numpy(dtype=np.int64)
        b = h2.fillna(0).to_numpy(dtype=np.int64)
        ok = ~null
        for i in range(k):
            pos = (a + i * b) % m_bits
            ok &= (words[pos >> 5] >> (pos & 31)) & 1 == 1
        return pd.Series(ok)

    h1, h2 = _hash_words(F.col(key_col), hasher)
    out = df.withColumn(out_col, _probe(h1, h2))
    # each call broadcasts a fresh bitset that lives for the app lifetime;
    # long-running probe loops should destroy it once the result is consumed
    out.sketch_broadcast = bc
    return out


def cm_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight: Column | None = None,
    hasher: str = "md5",
) -> DataFrame:
    """One-pass Count-Min build: (row, col, cnt) frame, depth*width cells max.

    Mergeable by ``groupBy(row, col).agg(sum(cnt))``. The shuffle after the
    map-side partial agg is bounded by depth*width regardless of input size.
    NULL keys are skipped; weight defaults to 1 per row.
    """
    if not 1 <= depth <= 8:
        raise ValueError(f"depth must be in [1, 8]: {depth}")
    w = (weight if weight is not None else F.lit(1)).cast("bigint")
    pos = F.posexplode(_positions(F.col(key_col), depth, width, hasher))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(w.alias("w"), pos.alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.sum("w").alias("cnt"))
    )


def cm_merge(*cms: DataFrame) -> DataFrame:
    """sum-merge same-shaped builds."""
    out = cms[0]
    for c in cms[1:]:
        out = out.unionByName(c)
    return out.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def hq_build(
    df: DataFrame, value_col: str, keys: list[str], bounds: list[int]
) -> DataFrame:
    """One-pass per-key histogram-quantile sketch build: (keys..., bucket,
    cnt) cells, at most ``len(bounds)+1`` buckets per key — the mergeable
    fixed-boundary form of the exporter-side histogram state
    (``model/pdata/metrics.go:129-141`` explicit-bounds Histogram; the
    OTLP bucket rule: bucket i holds values in (bounds[i-1], bounds[i]],
    the last bucket holds values > bounds[-1]).

    This is the 100 TB scale path for exact quantiles (q53): where the
    exact form must shuffle every value to its key's reducer, the sketch's
    shuffle is bounded by |keys| * buckets after map-side partial
    aggregation, and builds over disjoint slices merge by plain cell sum
    (:func:`hq_merge`). Integer-exact by construction — both the cell
    counts and the quantile rank rule (:func:`hq_quantiles`) replay in
    DuckDB, so the driver's oracle value-checks the whole path.

    NULL values carry no measurement and are skipped.
    """
    if sorted(bounds) != list(bounds) or len(set(bounds)) != len(bounds):
        raise ValueError(f"bounds must be strictly increasing: {bounds}")
    v = F.col(value_col)
    barr = F.array(*[F.lit(int(b)).cast("bigint") for b in bounds])
    bucket = F.size(F.filter(barr, lambda b: v > b))
    return (
        df.filter(v.isNotNull())
        .select(*keys, bucket.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hq_merge(*sketches: DataFrame, keys: list[str]) -> DataFrame:
    """sum-merge same-bounds builds (the cross-slice accumulation path)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def hq_quantiles(
    sketch: DataFrame, keys: list[str], bounds: list[int], quantiles: dict[str, int]
) -> DataFrame:
    """Per-key quantile estimates from a :func:`hq_build` sketch.

    ``quantiles`` maps output column name -> per-mille rank (500 = median).
    For each key the estimate is the UPPER bound of the first bucket whose
    cumulative count reaches ``rank = (q_pm * total + 999) div 1000`` (the
    ceiling order statistic) — i.e. the true q-quantile element is <= the
    estimate and > the previous bound (one-sided bucket containment, the
    same guarantee Prometheus's histogram_quantile gives). The overflow
    bucket (> bounds[-1]) has no upper bound and estimates NULL.

    All arithmetic is integer (per-mille ranks, DIV), so DuckDB replays it
    exactly. The window + final groupBy run over the SKETCH frame —
    |keys| * buckets cells, never the input — so this stage costs nothing
    at any input scale.
    """
    from pyspark.sql import Window as W

    w_cum = W.partitionBy(*keys).orderBy("bucket")
    w_all = W.partitionBy(*keys)
    x = (
        sketch.withColumn("_cum", F.sum("cnt").over(w_cum))
        .withColumn("_total", F.sum("cnt").over(w_all))
    )
    barr = F.array(*[F.lit(int(b)).cast("bigint") for b in bounds])
    aggs = [F.max("_total").cast("bigint").alias("n")]
    for name, q_pm in quantiles.items():
        if not 0 < q_pm <= 1000:
            raise ValueError(f"per-mille quantile out of range: {name}={q_pm}")
        rank = F.expr(f"({q_pm} * _total + 999) DIV 1000")
        pick = F.min(F.when(F.col("_cum") >= rank, F.col("bucket")))
        aggs.append(
            F.when(pick < len(bounds), F.get(barr, pick.cast("int"))).alias(name)
        )
    return x.groupBy(*keys).agg(*aggs)


def cm_estimate(
    df: DataFrame,
    cm: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    out_col: str = "cm_est",
    hasher: str = "md5",
) -> DataFrame:
    """Zero-shuffle point estimate: min over depth rows of the key's cells,
    evaluated as a projection against the collected sketch (depth*width
    longs). Always >= the true count (one-sided error)."""
    if depth * width > _MAX_COLLECT_CELLS:
        raise ValueError(f"sketch too large to collect: {depth}x{width}")
    dense = [0] * (depth * width)
    for r in cm.collect():
        dense[r["row"] * width + r["col"]] = r["cnt"]
    arr = F.array(*[F.lit(v).cast("bigint") for v in dense])
    pos = _positions(F.col(key_col), depth, width, hasher)
    cells = [
        F.get(arr, (F.lit(r * width) + F.get(pos, r)).cast("int")) for r in range(depth)
    ]
    return df.withColumn(out_col, F.least(*cells) if depth > 1 else cells[0])


def cm_estimate_big(
    df: DataFrame,
    cm: DataFrame,
    key_col: str,
    depth: int,
    width: int,
    out_col: str = "cm_est",
    hasher: str = "md5",
) -> DataFrame:
    """Scale form of :func:`cm_estimate` (same relationship as
    :func:`bloom_probe_big` to :func:`bloom_probe`): the literal-array form
    pays one py4j round-trip per cell — fine at 4x64, tens of seconds at
    4x4096. Here the dense cell tensor ships once per executor as a Spark
    broadcast (numpy int64, depth*width*8 bytes) and the estimate is an
    Arrow-batched vectorized row-min; hash words stay JVM-side. Identical
    estimates to :func:`cm_estimate` (asserted in test_sketches); NULL keys
    estimate NULL."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    if pd is None:  # pragma: no cover
        raise ImportError("pandas is required for the Arrow-batched sketch probes")
    if depth * width > _MAX_COLLECT_CELLS:
        raise ValueError(f"sketch too large to collect: {depth}x{width}")
    dense = np.zeros((depth, width), dtype=np.int64)
    pdf = cm.toPandas()
    dense[pdf["row"].to_numpy(dtype=np.int64), pdf["col"].to_numpy(dtype=np.int64)] = (
        pdf["cnt"].to_numpy(dtype=np.int64)
    )
    bc = df.sparkSession.sparkContext.broadcast(dense)

    @pandas_udf("bigint")
    def _est(h1: pd.Series, h2: pd.Series) -> pd.Series:
        cells = bc.value
        null = h1.isna().to_numpy()
        a = h1.fillna(0).to_numpy(dtype=np.int64)
        b = h2.fillna(0).to_numpy(dtype=np.int64)
        est = np.full(len(a), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(depth):
            est = np.minimum(est, cells[r, (a + r * b) % width])
        out = pd.Series(est).astype("Int64")
        out[null] = None
        return out

    h1, h2 = _hash_words(F.col(key_col), hasher)
    out = df.withColumn(out_col, _est(h1, h2))
    out.sketch_broadcast = bc  # see bloom_probe_big: caller-managed lifecycle
    return out


def hll_register_rollup(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: Column | str,
    distinct_col: str,
    p: int = 9,
) -> tuple[DataFrame, DataFrame]:
    """Two-level distinct-count rollup as a PORTABLE HLL register table
    (Flajolet et al. 2007), the engine-replayable sibling of
    ``aggregate.sketch_rollup`` (whose Apache-DataSketches binary state no
    other engine can decode — fine inside Spark, opaque to the oracle
    gate). State here is plain integers:

      register = h1 mod 2^p,   rho = trailing_zeros(h2) + 1   (53 if h2=0)

    with (h1, h2) the md5 52-bit word pair of :func:`_hash_words` — both
    expressible in any SQL dialect (DuckDB replays them verbatim, which is
    what makes q66 value-checkable). rho is computed as
    ``length(bin(h2 & -h2))``: the lowest set bit isolated, its binary
    length = trailing zeros + 1 — a geometric(1/2) observable, identical
    in Spark and DuckDB.

    Returns ``(fine, coarse)``: fine = (key_cols..., bucket, reg, rho)
    per-bucket registers — a storable rollup table; coarse =
    (key_cols..., reg, rho) obtained ONLY by max-merging fine (never
    rescanning the input), the HLL union. max is associative/commutative,
    so the merged registers are invariant to how rows were bucketed — the
    same identity test_sketch_rollup pins for the DataSketches path.
    The float cardinality estimate is one harmonic-mean formula away from
    these integers; keeping it OUT of the state keeps every row
    hash-stable across engines.
    """
    m = 1 << p
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    h1, h2 = _hash_words(F.col(distinct_col).cast("string"))
    rho = F.when(h2 == 0, F.lit(53)).otherwise(
        F.length(F.bin(h2.bitwiseAND(-h2)))
    )
    fine = (
        df.filter(F.col(distinct_col).isNotNull())
        .groupBy(
            *key_cols,
            bucket.alias("bucket"),
            (h1 % m).cast("int").alias("reg"),
        )
        .agg(F.max(rho).cast("int").alias("rho"))
    )
    coarse = fine.groupBy(*key_cols, "reg").agg(F.max("rho").cast("int").alias("rho"))
    return fine, coarse
