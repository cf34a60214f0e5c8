"""Probabilistic head sampler.

Reference: ``processor/probabilisticsamplerprocessor/probabilisticsampler.go``.

Decision order (:72-153):
1. `sampling.priority` attribute, if present (accepts int/double/string,
   :104-153): 0 => always drop, > 0 => always keep.
2. Otherwise keep iff ``murmur3_32(id_bytes, hash_seed) & 0x3FFF <
   percentage * 0x4000 / 100`` (:46-49, :84-89; murmur3 impl :155-207) —
   i.e. a 14-bit bucket test, deterministic per id so all records of one
   trace/conversation sample together.

Spark mapping: ``F.hash()`` IS murmur3_x86_32 but with Spark's fixed seed and
value layout, so for bit-exact reference parity we derive a 16-byte id
(md5 of conv_id, computed JVM-side) and run the same murmur3 in a vectorized
numpy pandas UDF — no per-row Python, Arrow batches throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from opentelemetry_collector_spark.functions.hashing import hex16_to_u32x4, murmur3_32_x4

_NUM_BUCKETS = 0x4000  # 14-bit, probabilisticsampler.go:42-49
_BITMASK = _NUM_BUCKETS - 1


def scaled_threshold(percentage: float) -> int:
    """uint32(percentage * percentageScaleFactor), scale = 0x4000/100."""
    pct = min(max(percentage, 0.0), 100.0)
    return int(pct * _NUM_BUCKETS / 100.0)


def keep_by_hash(id_hex_col: Column, percentage: float, hash_seed: int = 0) -> Column:
    """Boolean keep decision from a 32-hex-char id column."""
    threshold = scaled_threshold(percentage)

    @pandas_udf("boolean")
    def _keep(s: pd.Series) -> pd.Series:
        # a NULL id has no hash decision: emit NULL (the filter drops the
        # row) instead of letting hex16_to_u32x4 join None into the digest
        # string and kill the whole job — per-row degradation, same policy
        # as the try_cast on priority below
        out = pd.Series([None] * len(s), dtype="boolean")
        mask = s.notna()
        if mask.any():
            words = hex16_to_u32x4(s[mask].to_numpy(dtype=object))
            h = murmur3_32_x4(words, hash_seed)
            out[mask.to_numpy()] = (h & np.uint32(_BITMASK)) < np.uint32(threshold)
        return out

    return _keep(id_hex_col)


def probabilistic_sample(
    df: DataFrame,
    percentage: float,
    hash_seed: int = 0,
    id_col: str = "conv_id",
    priority_col: str | None = None,
) -> DataFrame:
    """Keep a deterministic ~percentage% of ids.

    priority_col (the `sampling.priority` analog): rows with 0 are dropped,
    rows with > 0 are kept unconditionally, NULL defers to the hash.
    """
    keep = keep_by_hash(F.md5(F.col(id_col).cast("string")), percentage, hash_seed)
    if priority_col is not None:
        # try_cast, not cast: the reference DEFERS to the hash decision when
        # a string priority fails strconv.ParseFloat
        # (probabilisticsampler.go:141-148); an ANSI cast would instead kill
        # the job on the first malformed attribute
        p = F.col(priority_col).try_cast("double")
        keep = F.when(p == 0.0, F.lit(False)).when(p > 0.0, F.lit(True)).otherwise(keep)
    return df.filter(keep)


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    budgets: dict[str, int],
    id_col: str,
    token_col: str,
) -> DataFrame:
    """Exact per-stratum token-budget mix (domain mixing): within each
    stratum, documents are taken in md5(id) order while the running token
    total stays within that stratum's budget (hard cap — a document is kept
    iff the cumulative token count *including it* is <= the budget). Strata
    absent from ``budgets`` are dropped.

    This is the training-mix construction step ("40 GT web, 5 GT code, ...")
    the reference has no analog for. Deterministic and seed-free: any engine
    reproduces the identical keep-set from the identical table.

    Scale: ONE hashpartitioning(stratum) exchange feeding a cumulative-sum
    window. Unlike :func:`stratified_sample` there is no rank-limit pushdown
    for a running *sum*, so each stratum's rows all shuffle to one task —
    right for dozens-to-thousands of domains, wrong for huge budgets over
    few strata; there, use :func:`token_budget_rate_sample`, which never
    sorts the corpus.
    """
    from pyspark.sql import Window

    b = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_budget", b[F.col(stratum_col)])
        .filter(F.col("_budget").isNotNull())
        # coalesce-to-0: a NULL token count must not poison the running sum
        # (every later row in the stratum would inherit NULL and be
        # dropped), nor depend on hash position — a costless row is kept
        # whenever the budget is still open, deterministically
        .withColumn(
            "_cum",
            F.sum(F.coalesce(F.col(token_col).try_cast("bigint"), F.lit(0))).over(w),
        )
        .filter(F.col("_cum") <= F.col("_budget"))
        .drop("_budget", "_cum")
    )


_HEX13_SCALE = float(16**13)  # 52-bit md5 prefix -> exact double fraction


def md5_fraction(col: Column) -> Column:
    """Uniform deterministic fraction in [0, 1): the first 13 hex chars of
    md5 (52 bits, exactly representable in a double) over 16^13. Both Spark
    (``conv(substring(md5(x),1,13),16,10)``) and DuckDB
    (``('0x' || substring(md5(x),1,13))::ubigint``) compute the identical
    value, so rate-based keeps are oracle-checkable bit-for-bit."""
    return (
        F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("double") / F.lit(_HEX13_SCALE)
    )


def token_budget_rate_sample(
    df: DataFrame,
    stratum_col: str,
    budgets: dict[str, int],
    id_col: str,
    token_col: str,
) -> DataFrame:
    """Scalable domain mixing: hit each stratum's token budget *in
    expectation* with zero corpus sort. Pass 1 aggregates per-stratum token
    totals (map-side partials, |strata| rows); the keep-rate
    ``min(1, budget/total)`` is broadcast back and a document is kept iff
    ``md5_fraction(id) < rate``. Both passes are embarrassingly parallel —
    the only corpus-side work is a projection + broadcast-join filter, so
    this is the 100 TB path (the exact window variant shuffles whole strata
    to single tasks).

    Deterministic: same table -> same keep-set, any engine (md5 prefix
    fraction, no RNG). Error vs the exact variant is O(1/sqrt(docs per
    stratum)) on the token total.
    """
    totals = (
        df.groupBy(stratum_col)
        .agg(F.sum(F.col(token_col).cast("bigint")).alias("_total"))
    )
    b = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    # NULL budget (stratum not in the mix) must DROP the stratum — gate on
    # the budget itself, not on least(), which skips NULL operands rather
    # than propagating them. A zero-token stratum divides by zero (ANSI
    # error, not NULL) — keep it whole instead, matching the exact
    # variant's hard cap (a cumulative sum of 0 never exceeds any budget).
    budget = b[F.col(stratum_col)].cast("double")
    rate = F.when(
        F.col("_total") > 0, F.least(F.lit(1.0), budget / F.col("_total"))
    ).otherwise(F.lit(1.0))
    rates = (
        totals.filter(budget.isNotNull())
        .select(F.col(stratum_col).alias("_stratum"), rate.alias("_rate"))
    )
    return (
        df.join(
            F.broadcast(rates), df[stratum_col] == rates["_stratum"], "inner"
        )
        .filter(md5_fraction(F.col(id_col).cast("string")) < F.col("_rate"))
        .drop("_stratum", "_rate")
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (training-mix
    construction: equal per-language / per-source document budgets).

    The keep-set is the k lowest ``md5(id)`` values inside each stratum —
    a uniform, seed-free permutation that any engine reproduces exactly
    (unlike rate-based sampling above, which matches the reference's
    murmur3 bucket test but cannot hit an exact count). One shuffle on
    the strata columns; ``row_number`` needs the per-stratum sort, but
    a WindowGroupLimit (rank-limit pushdown) keeps only k rows per
    stratum per map task before the exchange, so the shuffle carries
    O(k * strata * tasks), not the corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(F.md5(F.col(id_col).cast("string")), id_col)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Deterministic global training-order shuffle + sharding.

    Training consumes the corpus in pseudo-random order, and at 100 TB the
    only sane formulation is STATELESS: order key = md5(id) (a uniform
    total order any engine reproduces — no seed state, no global sort to
    assign it), shard = the key's 52-bit prefix scaled to ``n_shards`` in
    exact integer math. Shard assignment is a pure projection (zero
    shuffle, zero sort); writers then ``partitionBy("shard")`` and sort
    within partitions by ``order_key`` — the global permutation emerges
    from shard-major + key-minor order without any corpus-wide exchange.

    The batch processor's size-bounded rebatching
    (``batch_processor.go:151-163``) is the reference relative: bound the
    unit of downstream consumption; here the bound is per-shard row mass,
    uniform in expectation by the 52-bit uniformity of the prefix.

    Output: the input plus ``order_key`` (32-hex md5 of the stringified
    id) and ``shard`` (int in [0, n_shards)). NULL ids get NULL keys and
    shard NULL — junk stays visible rather than polluting shard 0.
    """
    if not 1 <= n_shards <= 2048:
        # prefix * n_shards must stay inside int64: 52 + 11 bits
        raise ValueError("n_shards must be in [1, 2048]")
    key = F.md5(F.col(id_col).cast("string"))
    prefix = F.conv(F.substring(key, 1, 13), 16, 10).cast("bigint")
    # exact integer scaling: the prefix is 52 bits, so (prefix * n) >> 52
    # floors prefix * n / 16^13 without ever touching a double (float
    # division loses the boundary bits past 2^53)
    shard = F.shiftright(prefix * n_shards, 52)
    return df.withColumn("order_key", key).withColumn(
        "shard", F.when(F.col(id_col).isNotNull(), shard).cast("int")
    )


def shard_manifest(assigned: DataFrame, *payload_sums: str) -> DataFrame:
    """Per-shard manifest of a ``shuffle_shards`` frame: row count and the
    [first, last] order-key range (what a training loader needs to plan
    epoch reads), plus an optional sum per named payload column (e.g.
    token counts for load balancing). One partial-aggregated shuffle of
    |shards| rows."""
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("order_key").alias("first_key"),
        F.max("order_key").alias("last_key"),
    ] + [F.sum(c).cast("bigint").alias(f"sum_{c}") for c in payload_sums]
    return assigned.groupBy("shard").agg(*aggs)


def epoch_expand(
    df: DataFrame,
    stratum_col: str,
    factors: dict[str, float],
    id_col: str,
    default_factor: float = 1.0,
) -> DataFrame:
    """Mixture-epoch expansion: repeat each row ``factor[stratum]`` times,
    fractional factors resolved per-row deterministically.

    The standard domain-mixing deployment shape (a 2.5x-weighted source
    means every doc appears twice and HALF the docs — chosen by hash, not
    rng — a third time), the up-sampling complement of the down-sampling
    budget samplers above. ``n_copies = floor(f) + (md5_fraction(id) <
    frac(f))``, so the expansion is engine-reproducible, exact in
    expectation, and a factor of 0.25 degenerates to plain rate sampling.

    Output: the input rows repeated with an ``epoch int`` column (1-based
    copy index — training loaders shuffle copies into different epochs via
    q83's sharding on (id, epoch)). Zero/absent-stratum factors default to
    ``default_factor``; factor 0 drops the stratum. Pure projection +
    Generate — no shuffle, no sort; the blow-up is the OUTPUT size, which
    is the point.
    """
    if any(f < 0 for f in factors.values()) or default_factor < 0:
        raise ValueError("epoch factors must be >= 0")
    fac = F.lit(float(default_factor))
    for k, v in sorted(factors.items()):
        fac = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(fac)
    base = F.floor(fac).cast("int")
    frac = fac - F.floor(fac)
    # NULL id has no hash fraction: no EXTRA copy, but the floor copies
    # still emit (a SQL CASE WHEN NULL<x yields the ELSE 0, and sibling
    # shuffle_shards' policy is that NULL-id junk stays visible)
    extra = F.coalesce(
        (md5_fraction(F.col(id_col).cast("string")) < frac), F.lit(False)
    ).cast("int")
    n = (base + extra).alias("_n_copies")
    out = df.withColumn("_n_copies", n).withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), F.col("_n_copies")))
    )
    # sequence(1, 0) counts DOWN (negative default step) — gate explicitly
    return out.filter(F.col("_n_copies") >= 1).drop("_n_copies")


def unimax_allocation(
    df: DataFrame,
    stratum_col: str,
    budget: int,
    cap_epochs: int = 1,
) -> DataFrame:
    """UniMax mixture allocation (Chung et al. 2023): split a total document
    budget across strata (languages/domains) as uniformly as possible,
    capping each stratum at ``cap_epochs`` passes over its own data — the
    water-filling rule that neither starves tail languages nor loops a
    small language hundreds of epochs. Exact integers end to end.

    Closed form instead of the paper's iterative loop: sort strata by cap
    ascending; between the i-th and (i+1)-th cap every unsaturated stratum
    receives the same water level ``t``, so the feasible level there is
    ``t_i = (budget - prefix_i) div (n - i)`` (prefix_i = the i smaller
    caps, all saturated). Over i the candidate sequence rises while the
    saturation assumption understates (removing a below-average cap raises
    the average) and falls once it overstates, so the true water level is
    simply ``max_i t_i``; each stratum gets ``min(cap, t)``. Pinned
    against a brute-force search in tests. Integer division
    means up to n-1 leftover docs stay unallocated — deterministic, and
    documented rather than distributed by an arbitrary tiebreak.

    Output: (stratum, n_docs, cap, alloc). ``alloc`` may exceed ``n_docs``
    when ``cap_epochs > 1`` (upsampling — feed :func:`epoch_expand`);
    apply downsampling allocations with :func:`stratified_sample`-style
    rank limits. Physical shape: one partial-aggregated groupBy to the
    per-stratum counts, then windows over the STRATA frame (rows = number
    of strata, never the corpus) — including the stratum count and the
    water level itself, so the whole allocation is ONE Spark job with no
    driver round-trips (the r4 bench flag on q110 traced to the previous
    form's three sequential actions: a count(), a first() collect, and
    the final query re-deriving the strata frame — pure job-scheduling
    overhead on a frame of a few dozen rows).
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    if cap_epochs < 1:
        raise ValueError("cap_epochs must be >= 1")
    caps = (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn("cap", (F.col("n_docs") * cap_epochs).cast("bigint"))
    )
    w = Window.orderBy(F.asc("cap"), F.asc("stratum"))
    whole = Window.partitionBy()
    ranked = (
        caps.withColumn("_i", F.row_number().over(w) - 1)
        .withColumn(
            "_prefix",
            F.coalesce(
                F.sum("cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(whole))
    )
    level = F.greatest(
        F.max(F.expr(f"({budget} - _prefix) div (_n - _i)")).over(whole),
        F.lit(0).cast("bigint"),
    )
    return ranked.select(
        "stratum",
        "n_docs",
        "cap",
        F.least(F.col("cap"), level).cast("bigint").alias("alloc"),
    )


_MIN_FRACTION = 2.0**-52  # md5_fraction's one-ulp floor: u == 0 is possible


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the k
    items with the largest priority ``w / u`` where ``u`` is the item's
    own :func:`md5_fraction` — priority sampling (Duffield, Lund & Thorup,
    JACM'07) with the hash standing in for the uniform draw, so the sample
    is a pure function of the data (seed-free, replay-stable, and
    engine-reproducible: both engines compute the identical IEEE division
    of identical doubles, so the ORDER is identical even though the
    priority itself is a float — the float never lands in the output).

    The quality-weighted complement of :func:`stratified_sample`: weight
    by a quality score / token count and heavy documents are
    proportionally more likely to survive, while the hash keeps any
    specific corpus deterministic. Rows with NULL or non-positive weight
    are not in the population.

    Scale shape: with ``stratum_col``, a rank window whose only consumer
    is ``row_number <= k`` — Partial WindowGroupLimit ships O(k·strata)
    rows per task through the shuffle (the rate_limit property). Without
    it, a global top-k via TakeOrderedAndProject: every task keeps k rows,
    no global sort.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    u = F.greatest(
        md5_fraction(F.col(id_col).cast("string")), F.lit(_MIN_FRACTION)
    )
    pop = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    pr = (F.col(weight_col).cast("double") / u).alias("_pr")
    if stratum_col is None:
        return (
            pop.withColumn("_pr", pr)
            .orderBy(F.desc("_pr"), F.asc(id_col))
            .limit(k)
            .drop("_pr")
        )
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(F.desc(pr), F.asc(id_col))
    return (
        pop.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def tail_sample_decisions(
    spans: DataFrame,
    latency_ms: int | None = None,
    keep_error_traces: bool = True,
    rate_pm: int = 0,
    trace_col: str = "trace_id",
) -> DataFrame:
    """Tail-based trace sampling decisions (the collector-contrib
    tailsamplingprocessor shape — core ships only the head sampler,
    probabilisticsampler.go): decide per TRACE after seeing all its spans,
    first-match policy order status_code -> latency -> probabilistic.

    One partial-aggregated groupBy(trace_id) reduces the span corpus to a
    trace-sized decision frame:
      - ``status_code``: any span with status_code == 2 (ERROR)
      - ``latency``: whole-trace wall time max(start+duration) - min(start)
        >= latency_ms
      - ``probabilistic``: md5(trace_id) 52-bit prefix under rate_pm
        per-mille — integer cross-multiplied (prefix * 1000 < rate_pm *
        16^13), deterministic and engine-exact
    Undecided traces get reason NULL / keep 0. Spans frame contract:
    trace_col, ts (timestamp), duration_us, status_code.
    """
    if rate_pm < 0 or rate_pm > 1000:
        raise ValueError(f"rate_pm must be in [0, 1000], got {rate_pm}")
    start_us = F.unix_micros(F.to_utc_timestamp(F.col("ts"), "UTC"))
    per_trace = spans.groupBy(trace_col).agg(
        F.max((F.col("status_code") == 2).cast("int")).alias("_err"),
        (F.max(start_us + F.col("duration_us")) - F.min(start_us)).alias("_trace_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
    )
    prefix = F.conv(F.substring(F.md5(F.col(trace_col)), 1, 13), 16, 10).cast("bigint")
    reason = F.when(
        F.lit(keep_error_traces) & (F.col("_err") == 1), F.lit("status_code")
    )
    if latency_ms is not None:
        reason = reason.when(
            F.col("_trace_us") >= F.lit(int(latency_ms) * 1000), F.lit("latency")
        )
    reason = reason.when(
        prefix * F.lit(1000) < F.lit(rate_pm) * F.lit(16**13), F.lit("probabilistic")
    )
    return per_trace.select(
        trace_col,
        "n_spans",
        (F.col("_trace_us")).cast("bigint").alias("trace_duration_us"),
        reason.alias("reason"),
        reason.isNotNull().cast("int").alias("keep"),
    )


def tail_sample(
    spans: DataFrame,
    latency_ms: int | None = None,
    keep_error_traces: bool = True,
    rate_pm: int = 0,
    trace_col: str = "trace_id",
) -> DataFrame:
    """Apply tail-sampling decisions back to the span corpus: inner join
    against the kept trace ids (trace-sized frame — AQE broadcasts it when
    small, plain equi-shuffle otherwise), every span of a kept trace
    survives with its decision ``reason`` attached (all-or-nothing per
    trace, the tail sampler's defining invariant)."""
    kept = tail_sample_decisions(
        spans, latency_ms, keep_error_traces, rate_pm, trace_col
    ).filter(F.col("keep") == 1).select(trace_col, "reason")
    return spans.join(kept, on=trace_col, how="inner")


def leakage_safe_split(
    df: DataFrame,
    group_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 800), ("val", 100), ("test", 100)),
) -> DataFrame:
    """Train/val/test assignment that cannot leak correlated rows across
    splits: the unit of assignment is the GROUP (a near-dup cluster id
    from ``dedup.dedup_clusters``, a conversation id, a source domain),
    never the row. A near-dup pair straddling train and test silently
    inflates eval scores — the classic split bug this operator makes
    structurally impossible (every member of a group shares the group's
    md5, hence the group's split).

    ``splits`` are (name, per-mille weight) summing to 1000. Assignment
    is the :func:`shuffle_shards` idiom: 52-bit md5 prefix of the group
    key scaled in exact integer math — stateless, engine-portable,
    stable under any partitioning and across runs (adding documents
    never reassigns an existing group). A pure projection: zero shuffle,
    zero sort; NULL group keys get a NULL split (junk stays visible).
    """
    weights = [w for _, w in splits]
    if sum(weights) != 1000 or any(w <= 0 for w in weights):
        raise ValueError(f"split weights must be positive and sum to 1000: {splits}")
    prefix = F.conv(
        F.substring(F.md5(F.col(group_col).cast("string")), 1, 13), 16, 10
    ).cast("bigint")
    pm = F.shiftright(prefix * 1000, 52)
    expr: Column = F.lit(None).cast("string")
    cum = 0
    branches = []
    for name, w in splits:
        cum += w
        branches.append((cum, name))
    # build CASE from the first boundary up; last branch covers the rest
    case = F.when(pm < branches[0][0], F.lit(branches[0][1]))
    for bound, name in branches[1:-1]:
        case = case.when(pm < bound, F.lit(name))
    if len(branches) > 1:
        case = case.otherwise(F.lit(branches[-1][1]))
    expr = F.when(F.col(group_col).isNotNull(), case)
    return df.withColumn("split", expr)
