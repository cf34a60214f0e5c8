"""Aggregation stage: the batch-processor / exporter-accumulator analogs.

- :func:`turn_counts` — groupBy(conv_id, role) counts + ts bounds (the
  obsreport per-component counter analog, generalized; north_rule's
  "groupBy(conv_id, role) window and count aggregates"). Optional salted
  two-phase aggregation for hot conversations.
- :func:`accumulate_last` — the Prometheus exporter accumulator: keep the
  latest value per timeseries signature, dropping stale timestamps
  (``exporter/prometheusexporter/accumulator.go:65-132,353-384``).
- :func:`timeseries_group` — the remote-write exporter's tsMap grouping:
  all (ts, value) points gathered per label signature, time-ordered
  (``exporter/prometheusremotewriteexporter/exporter.go:99-243``).

Scale notes: groupBy aggregates get map-side partial aggregation for free
(HashAggregate partial -> shuffle -> final). Salting is exposed for the case
where a single conv_id floods even the partial-agg path (hot key with high
distinct sub-key cardinality); AQE skew-join handles the join side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def turn_counts(df: DataFrame, salt_buckets: int | None = None) -> DataFrame:
    """(conv_id, role, turn_count, first_ts, last_ts) per FIXTURES.md §5."""
    if not salt_buckets:
        return df.groupBy("conv_id", "role").agg(
            F.count(F.lit(1)).alias("turn_count"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    # two-phase salted aggregation: partial by (key, salt), then final merge
    salted = df.withColumn("_salt", F.pmod(F.xxhash64("turn_idx", "ts"), F.lit(salt_buckets)))
    partial = salted.groupBy("conv_id", "role", "_salt").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min("ts").alias("_f"),
        F.max("ts").alias("_l"),
    )
    return partial.groupBy("conv_id", "role").agg(
        F.sum("_c").alias("turn_count"),
        F.min("_f").alias("first_ts"),
        F.max("_l").alias("last_ts"),
    )


def accumulate_last(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    tiebreak: list[str] | None = None,
    as_of=None,
    expiration_seconds: int | None = None,
) -> DataFrame:
    """Latest ROW per signature (accumulator.go:353-384 keeps the sample
    with the newest timestamp and drops older/stale ones). Whole rows are
    kept, so there is no value-column parameter to pick.

    Deterministic under ties via explicit tiebreak ordering (the reference
    processes serially so last-write-wins; a parallel engine must order).

    Expiry (accumulator.go:357-362): with `as_of` + `expiration_seconds`,
    signatures whose latest sample is older than as_of - expiration are
    dropped from the snapshot — the batch form of the Collect()-time sweep,
    with an explicit as-of instant instead of wall-clock for determinism.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if as_of is not None and expiration_seconds is not None:
        cutoff = F.lit(as_of).cast("timestamp") - F.make_interval(secs=F.lit(expiration_seconds))
        out = out.filter(F.col(ts_col) >= cutoff)
    return out


def timeseries_group(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-signature time-ordered series, rendered deterministically.

    collect_list is order-nondeterministic post-shuffle, so sort the struct
    array (struct comparison is field-order lexicographic => ts first).
    """
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.array_sort(F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(value_col).alias("v")))).alias(
            "series"
        ),
    )


def bucket_index(value, bounds: list[float]):
    """OTLP explicit-bounds bucketing: bucket i holds values in
    (bounds[i-1], bounds[i]]; the final bucket holds values > bounds[-1]
    (``model/pdata/metrics.go`` Histogram/IntHistogram explicit_bounds).
    Index = number of bounds strictly below the value. Pure JVM expression.
    A NULL value has no bucket and yields NULL (without the guard the
    filter predicate is NULL for every bound, silently mapping junk
    samples into bucket 0).
    """
    v = F.col(value) if isinstance(value, str) else value
    barr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.when(v.isNotNull(), F.size(F.filter(barr, lambda b: v > b)))


def histogram_merge(
    df: DataFrame,
    keys: list[str],
    counts_col: str = "bucket_counts",
    sum_col: str = "h_sum",
    count_col: str = "h_count",
) -> DataFrame:
    """Merge histogram datapoints per label signature: bucket-wise vector
    add + scalar sum/count (what the Collector's metric exporters do when
    combining Histogram datapoints of one timeseries,
    ``model/pdata/metrics.go:129-141`` Histogram; remote-write groups them
    via the same label-signature map, ``exporter.go:99-243``).

    Physical shape: posexplode -> partial-agg-friendly groupBy(keys, pos)
    -> array rebuild via sorted struct collect. One shuffle keyed by
    (keys, pos), so a signature with B buckets spreads over B reduce groups
    — no single hot reducer even for a dominant series; map-side partial
    aggregation compresses each task to |keys|*B rows before the shuffle.
    """
    # posexplode_OUTER: a datapoint with NULL/empty bucket_counts still has
    # meaningful scalars — plain posexplode would emit zero rows for it and
    # silently drop its h_sum/h_count from the merge
    exploded = df.select(
        *keys,
        F.col(sum_col),
        F.col(count_col),
        F.posexplode_outer(F.col(counts_col)).alias("_pos", "_c"),
    )
    per_bucket = exploded.groupBy(*keys, "_pos").agg(
        F.sum("_c").alias("_bsum"),
        # carry the scalar pair through exactly one group per row: bucket 0
        # for normal datapoints, the NULL-pos group for degenerate ones
        F.sum(F.when(F.col("_pos").isNull() | (F.col("_pos") == 0), F.col(sum_col))).alias("_s0"),
        F.sum(F.when(F.col("_pos").isNull() | (F.col("_pos") == 0), F.col(count_col))).alias("_n0"),
    )
    return per_bucket.groupBy(*keys).agg(
        F.transform(
            # collect_list skips NULL elements, so the NULL-pos scalar
            # carrier never lands in the rebuilt counts array
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_pos").isNotNull(), F.struct(F.col("_pos"), F.col("_bsum")))
                )
            ),
            lambda s: s["_bsum"],
        ).alias(counts_col),
        F.sum("_s0").alias(sum_col),
        F.sum("_n0").alias(count_col),
    )


def stable_order(df: DataFrame) -> DataFrame:
    """The per-turn stable ordering invariant: (conv_id, turn_idx).

    Used before any order-sensitive output; cluster-side this is a
    sortWithinPartitions after repartition(conv_id) so no global sort."""
    return df.repartition("conv_id").sortWithinPartitions("conv_id", "turn_idx")


def distinct_count_salted(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int | None = None,
) -> DataFrame:
    """Exact distinct-value count per key with bounded reducer groups.

    Salting by the HASH OF THE VALUE partitions each key's value space into
    disjoint buckets, so per-bucket distinct counts sum exactly. Measured
    honestly (BENCH/SKEW.md): at 40M rows Spark's own expand-based
    countDistinct already hash-spreads the hot key's values, so salting is
    wall-time-neutral there; its value is the guarantee that NO single
    reduce group ever exceeds ~|values|/buckets — the insurance needed when
    one conversation's distinct set approaches executor memory (SURVEY §7
    risk 3 at the 100 TB scale).
    """
    if not salt_buckets:
        return df.groupBy(*key_cols).agg(F.countDistinct(value_col).alias("distinct_count"))
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value_col)), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.countDistinct(value_col).alias("_dc")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_dc").alias("distinct_count"))


def bucketed_row_number(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    bucket: Column,
    out_col: str = "rn",
) -> DataFrame:
    """Skew-proof per-key sequence numbering (exact two-phase row_number).

    A plain ``row_number() over (partition by key order by ...)`` sorts ONE
    task per key — a conversation with 10^8 turns serializes the whole
    stage (SURVEY §7 risk 3; the turn-index derivation itself is this
    window). Sharding fix: ``bucket`` must be a monotone function of the
    order (e.g. ``F.date_trunc('day', ts)`` or ``turn_idx div N``) so
    bucket boundaries respect the global order; then

    1. local row_number within (key, bucket) — the hot key's work spreads
       over its buckets;
    2. per-(key, bucket) counts -> cumulative offsets per key (a tiny
       |keys x buckets| frame, broadcast back);
    3. global number = offset + local number. Exact, because ties can only
       occur inside one bucket (the bucket is a function of the order
       columns).

    With a constant bucket this degenerates to the plain window; with B
    buckets the largest sort task shrinks by ~B.
    """
    b = df.withColumn("_bk", bucket)
    w_local = Window.partitionBy(*key_cols, "_bk").orderBy(*order_cols)
    local = b.withColumn("_lrn", F.row_number().over(w_local))
    counts = b.groupBy(*key_cols, "_bk").agg(F.count(F.lit(1)).alias("_n"))
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy("_bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w_cum), F.lit(0))).drop("_n")
    return (
        local.join(F.broadcast(offsets), [*key_cols, "_bk"])
        # bigint: the whole point is keys with billions of rows — an int
        # cast would ANSI-overflow at 2^31 rows per key
        .withColumn(out_col, (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_bk", "_lrn", "_off")
    )


def adjust_cumulative(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Cumulative-counter start-time adjustment with reset detection — the
    batch form of the Prometheus receiver's MetricsAdjuster
    (``receiver/prometheusreceiver/internal/metrics_adjuster.go:254-305``:
    ``isReset`` flags ``current < previous``; non-reset points get
    ``current.StartTimestamp = initial.StartTimestamp`` where *initial* is
    the first point since the last reset), composed with the
    cumulative→delta ``AggregationTemporality`` conversion
    (``model/pdata/metrics.go:291-301``) that Prometheus ``increase()``
    implements: ``delta = v - prev`` within an epoch, NULL at epoch starts
    (an initial/reset point has no baseline — the adjuster likewise returns
    false and emits no adjusted point for it).

    Output columns: the input row plus
      - ``start_ts``  — adjusted start timestamp (first point of the
        current reset epoch; the adjuster's ``initial.StartTimestamp``),
      - ``delta``     — increase since the previous sample (NULL at epoch
        starts),
      - ``is_reset``  — true on the first point of every epoch AFTER the
        series' first (a genuine counter restart, not series birth).

    Physical shape: every window shares ONE ``hashpartitioning(keys)``
    exchange + one sort — the reset flag is a lag, the epoch start is a
    *running max of reset-point timestamps* over the same frame (avoiding a
    (keys, epoch)-partitioned second window, which would re-shuffle).
    Series cardinality ~ label sets, each series sorted within one task; a
    single series never exceeds its scrape count, so the sort is bounded by
    points-per-series, not corpus size.

    A NULL value or NULL timestamp is not a datapoint (the OTLP model
    cannot express one) — such rows are DROPPED up front, so the lag
    baseline bridges over them; keeping them would turn every post-NULL
    sample into a spurious reset. Matches
    :func:`streaming.stream.adjust_cumulative_stream` row-for-row.
    """
    df = df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    v, prev = F.col(value_col), F.lag(value_col).over(w)
    epoch_start = prev.isNull() | (v < prev)
    return (
        df.withColumn("_es", epoch_start)
        .withColumn("is_reset", F.col("_es") & F.lag(ts_col).over(w).isNotNull())
        .withColumn(
            "start_ts",
            F.max(F.when(F.col("_es"), F.col(ts_col))).over(w_run),
        )
        .withColumn("delta", F.when(~F.col("_es"), v - prev))
        .drop("_es")
    )


def error_budget_burn(
    df: DataFrame,
    keys: list[str],
    error_col: str | Column,
    ts_col: str = "ts",
    budget_ppm: int = 10_000,
    short_unit: str = "hour",
    long_unit: str = "day",
) -> DataFrame:
    """Multi-window SLO error-budget burn (the alerting aggregate the
    Collector's obsreport counters feed: refused/accepted per component,
    ``internal/obsreportconfig/obsmetrics/obs_receiver.go:24-55`` — here
    turned into the Google-SRE multiwindow burn-rate rule: alert iff BOTH
    the short and the long window burn faster than budget).

    Integer-exact across engines: ratios are parts-per-million via BIGINT
    floor division (float division drifts between engines); burn flag =
    ``err_ppm > budget_ppm`` on both windows.

    Physical shape: one partial-aggregated groupBy(keys, short bucket) over
    the raw scan — the only pass over the data; the long window is a
    window-SUM over the already-aggregated short-bucket frame (|keys| x
    |buckets| rows), partitioned by (keys, long bucket). No second scan,
    no join.
    """
    err = F.col(error_col) if isinstance(error_col, str) else error_col
    short_b = F.date_trunc(short_unit, F.col(ts_col))
    hourly = df.groupBy(*keys, short_b.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(err.cast("bigint")).cast("bigint").alias("n_err"),
    )
    w_long = Window.partitionBy(*keys, F.date_trunc(long_unit, F.col("bucket")))
    # `div` (not `/`): bigint / bigint is a DOUBLE divide, and 10^6 * a
    # 10^12-row count overflows the 52-bit mantissa — integer division is
    # exact at any scale and floors identically to DuckDB's `//`
    return (
        # one select => one Window node => ONE (keys, long-bucket) exchange
        # (chained withColumns would give each window sum its own exchange)
        hourly.select(
            "*",
            F.sum("n_total").over(w_long).cast("bigint").alias("n_total_long"),
            F.sum("n_err").over(w_long).cast("bigint").alias("n_err_long"),
        )
        .withColumn("err_ppm", F.expr("(1000000 * n_err) div n_total"))
        .withColumn("err_ppm_long", F.expr("(1000000 * n_err_long) div n_total_long"))
        .withColumn(
            "fast_burn",
            (F.col("err_ppm") > F.lit(budget_ppm)) & (F.col("err_ppm_long") > F.lit(budget_ppm)),
        )
    )


def sketch_rollup(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str | Column,
    distinct_col: str,
    lg_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Two-level distinct-count rollup on mergeable HLL sketches (Apache
    DataSketches via ``hll_sketch_agg``): sketch once per fine bucket, merge
    partials upward with ``hll_union_agg`` — never rescan the input for a
    coarser level.

    The reference's Prometheus accumulator recomputes every aggregation
    level from raw points per scrape (``exporter/prometheusexporter/
    accumulator.go:65-132``, feasible only because its state is one
    process's worth); at 10^12 turns a per-(day, role) distinct-conv count
    that must ALSO roll up to per-role totals cannot afford a second scan —
    HLL registers max-merge, so the merged estimate is invariant to HOW the
    rows were bucketed (day buckets vs any hash bucketing: identical result,
    asserted in tests/test_sketch_rollup.py). Estimates may differ from a
    never-unioned direct sketch by ±1: DataSketches answers direct sketches
    with the HIP estimator and union results with the composite estimator.

    Returns ``(fine, coarse)``: fine = per (key_cols + bucket) rows with a
    binary ``sketch`` column (storable as a parquet rollup table — the
    hypertable continuous-aggregate pattern) and an ``approx_distinct``
    estimate; coarse = per key_cols rows whose estimate came only from
    merging fine sketches.
    """
    bucket = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    fine = (
        df.groupBy(*key_cols, bucket.alias("bucket"))
        .agg(F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("sketch"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )
    coarse = (
        fine.groupBy(*key_cols)
        .agg(F.hll_union_agg("sketch").alias("sketch"), F.count(F.lit(1)).alias("n_buckets"))
        .withColumn("approx_distinct", F.hll_sketch_estimate("sketch"))
    )
    return fine, coarse


def accumulate_deltas(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "delta",
    tiebreak: list[str] | None = None,
    out_col: str = "cumulative",
) -> DataFrame:
    """Delta->cumulative temporality conversion — the direction the
    Prometheus remote-write exporter requires (PRW only accepts cumulative
    series; OTLP sums declare DELTA or CUMULATIVE,
    ``model/pdata/metrics.go:291-301``) and the exact inverse of
    :func:`adjust_cumulative` within an epoch: running sum of deltas per
    series in (ts, tiebreak) order. NULL deltas are not datapoints and are
    dropped up front, mirroring adjust_cumulative.

    One window, one ``hashpartitioning(keys)`` exchange; a series' work is
    bounded by its own point count.
    """
    df = df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def service_graph(
    spans: DataFrame,
    *,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    service_col: str = "service_name",
    status_col: str = "status_code",
    duration_col: str = "duration_us",
) -> DataFrame:
    """Service dependency graph from a flattened span frame: one row per
    (parent_service -> child_service) edge with call count, error count and
    exact p50 latency.

    This is the topology aggregation observability backends derive from the
    trace data the reference merely transports (the span frame of
    ``translator/trace/zipkinv2``, flattened per SURVEY §1.3); the edge
    relation is the CHILD_OF reference the Jaeger translator encodes
    (``translator/trace/jaeger/traces_to_jaegerproto.go:274-332``).

    Physical shape: one self-join keyed ``(trace, span_id)`` — both sides
    hash-partition on the same key, so AQE can size, broadcast, or
    skew-split it like any equi-join (a hot trace is an ordinary skewed
    key) — then one partial-aggregated groupBy over the edge labels. The
    p50 uses dyadic-exact ``F.percentile`` over integer micros (the q53
    technique: at p=0.5 interpolation is a halving, bit-exact across
    engines). Root spans (NULL parent) parent no edge; a parent id that
    resolves to no span (in-flight partial trace) drops out of the inner
    join, matching what a topology can actually see.
    """
    child = spans.select(
        F.col(trace_col).alias("_t"),
        F.col(parent_col).alias("_p"),
        F.col(service_col).alias("child_service"),
        F.col(status_col).alias("_status"),
        F.col(duration_col).alias("_dur"),
    ).filter(F.col("_p").isNotNull())
    parent = spans.select(
        F.col(trace_col).alias("_t"),
        F.col(span_col).alias("_p"),
        F.col(service_col).alias("parent_service"),
    )
    edges = child.join(parent, ["_t", "_p"], "inner")
    return edges.groupBy("parent_service", "child_service").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_calls"),
        F.sum((F.col("_status") == 2).cast("bigint")).cast("bigint").alias("n_errors"),
        F.floor(F.percentile("_dur", 0.5)).cast("bigint").alias("p50_duration_us"),
    )


def span_selftime(
    spans: DataFrame,
    *,
    trace_col: str = "trace_id",
    span_col: str = "span_id",
    parent_col: str = "parent_span_id",
    service_col: str = "service_name",
    name_col: str = "name",
    duration_col: str = "duration_us",
) -> DataFrame:
    """Flame-graph self-time profile from a flattened span frame: one row
    per (service, operation) with span count, total duration, exclusive
    self-time (duration minus the sum of direct children's durations,
    clamped at zero), and each row's share of corpus-wide self-time.

    This is the "where does the time actually go" aggregation an APM
    backend derives from the spans the reference transports — the
    exclusive-time complement of :func:`service_graph`'s edge topology
    (same CHILD_OF relation, ``traces_to_jaegerproto.go:274-332``).
    Clamping: async/overlapping children can sum past the parent's wall
    time; standard flame-graph semantics floor the parent's exclusive
    time at zero, and ``n_clamped`` reports how often (the signal that a
    corpus is async-heavy and wall-time attribution is approximate).

    Physical shape: ONE partial-aggregated groupBy reduces the corpus to
    per-(trace, parent) child sums — the shuffle carries one row per
    parent span, never the span corpus — then one equi-join keyed
    ``(trace, span_id)`` (AQE-sizable like service_graph's) and one
    partial-aggregated groupBy over the labels. The share window sorts
    only the label-cardinality output frame. NULL durations contribute
    zero but still count as spans (junk policy: a clockless span exists,
    its time is unknown).
    """
    dur0 = F.coalesce(F.col(duration_col), F.lit(0)).cast("bigint")
    child_sums = (
        spans.filter(F.col(parent_col).isNotNull())
        .groupBy(
            F.col(trace_col).alias("_t"), F.col(parent_col).alias("_p")
        )
        .agg(F.sum(dur0).cast("bigint").alias("_child_us"))
    )
    joined = spans.select(
        F.col(trace_col).alias("_t"),
        F.col(span_col).alias("_p"),
        F.col(service_col).alias("service"),
        F.col(name_col).alias("op"),
        dur0.alias("_dur"),
    ).join(child_sums, ["_t", "_p"], "left")
    raw_self = F.col("_dur") - F.coalesce(F.col("_child_us"), F.lit(0))
    per_label = joined.groupBy("service", "op").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum((raw_self < 0).cast("bigint")).cast("bigint").alias("n_clamped"),
        F.sum("_dur").cast("bigint").alias("total_us"),
        F.sum(F.greatest(raw_self, F.lit(0))).cast("bigint").alias("self_us"),
    )
    # integer `div` (truncating; exact — all operands non-negative), never a
    # double quotient: 1000*self can exceed 2^53 at corpus scale
    return (
        per_label.withColumn(
            "_tot", F.sum("self_us").over(Window.partitionBy())
        )
        .withColumn(
            "self_share_pm",
            F.expr(
                "CASE WHEN _tot > 0 THEN (self_us * 1000) div _tot ELSE 0 END"
            ).cast("bigint"),
        )
        .drop("_tot")
    )


def robust_anomalies(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    thresh_pm: int = 3500,
) -> DataFrame:
    """Median/MAD outlier flagging per key group, integer-exact (the
    alerting rule observability backends run over the counter streams the
    reference transports; robust statistics because hot outliers are the
    thing being detected, so mean/stddev are self-poisoning).

    All arithmetic stays in integers via the doubled-percentile technique
    (q53/q79): over integer values the p=0.5 interpolation is a halving,
    so ``med2 = 2*median`` and ``dev2 = |2x - med2|`` are exact integers,
    as is ``mad4 = 2*median(dev2)`` (= 4x the MAD). A point is anomalous
    iff ``|x - med| > (thresh_pm/1000) * MAD``, evaluated as the integer
    cross-multiplication ``dev2 * 2000 > thresh_pm * mad4`` — no float
    division anywhere, and the MAD==0 degenerate case (constant series)
    falls out naturally: any deviation flags. ``score_pm`` is the ratio in
    per-mille for ranking (exact integer division, capped by construction
    only by the data).

    Physical shape: two whole-partition window aggregates over the SAME
    ``hashpartitioning(keys)`` — the med2 window feeds dev2, the mad4
    window aggregates it — so the operator costs ONE exchange, never a
    join back. Rows with NULL values pass through unflagged.
    """
    w = Window.partitionBy(*keys)
    x2 = F.col(value_col).cast("bigint") * 2
    out = df.withColumn(
        "_med2",
        F.floor(
            F.percentile(F.col(value_col).cast("bigint"), 0.5).over(w) * 2
        ).cast("bigint"),
    )
    out = out.withColumn(
        "_dev2",
        F.when(F.col(value_col).isNotNull(), F.abs(x2 - F.col("_med2"))).cast("bigint"),
    )
    out = out.withColumn(
        "mad4", F.floor(F.percentile(F.col("_dev2"), 0.5).over(w) * 2).cast("bigint")
    )
    return (
        out.withColumn(
            "is_anomaly",
            F.when(
                F.col(value_col).isNotNull(),
                F.col("_dev2") * 2000 > F.lit(int(thresh_pm)) * F.col("mad4"),
            ).otherwise(F.lit(False)),
        )
        .withColumn(
            "score_pm",
            F.coalesce(
                F.expr("_dev2 * 2000 div greatest(mad4, 1)"), F.lit(0)
            ).cast("bigint"),
        )
        .withColumn("med2", F.col("_med2"))
        .drop("_med2", "_dev2")
    )


def role_transitions(
    df: DataFrame,
    key_col: str = "conv_id",
    order_col: str = "turn_idx",
    label_col: str = "role",
) -> DataFrame:
    """First-order transition matrix over per-conversation label sequences
    (dialog-flow analytics: who speaks after whom, the Markov view of the
    (conv_id, turn_idx) ordering invariant): per (from_label, to_label),
    the transition count and its per-mille share of the from-label's
    outgoing edges — integer-exact division, no float drift.

    Physical shape: one lag window on ``hashpartitioning(key)`` (the
    ordering invariant's own partitioning), one partial-aggregated groupBy
    to the label-pair counts — the shuffle carries only label pairs from
    there — and one window over that tiny frame for the per-source
    normalization. Conversation boundaries never leak: lag is NULL at each
    sequence start, and those rows drop."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    pairs = (
        df.select(
            F.lag(label_col).over(w).alias("from_role"),
            F.col(label_col).alias("to_role"),
        )
        .filter(F.col("from_role").isNotNull())
        .groupBy("from_role", "to_role")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    tot = Window.partitionBy("from_role")
    return pairs.withColumn(
        "_out", F.sum("n_transitions").over(tot)
    ).select(
        "from_role",
        "to_role",
        "n_transitions",
        F.expr("n_transitions * 1000 div _out").cast("bigint").alias("p_pm"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel over an event stream: a user reaches step i at the
    EARLIEST event of that type strictly after their step-(i-1) time (the
    classic product-analytics conversion funnel; strictly-ordered
    semantics, not mere set membership). Returns one row per step:
    (step_idx, step, n_users).

    Physical shape: one filtered min-aggregate per step, each joined back
    to the survivors frame — every aggregate and join is keyed on the user
    column, so the chain re-uses one partitioning and the frames shrink
    monotonically (step i's frame only holds users who reached it). No
    windows over the raw stream, no per-user arrays — a power user with
    millions of events costs one partial-aggregated min per step.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ts = F.col(ts_col)
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts).alias("_s0"))
    )
    frames = [cur]
    for i, st in enumerate(steps[1:], 1):
        cand = df.filter(F.col(type_col) == st).select(
            F.col(user_col), ts.alias("_t")
        )
        cur = (
            cand.join(cur.select(user_col, f"_s{i-1}"), user_col)
            .filter(F.col("_t") > F.col(f"_s{i-1}"))
            .groupBy(user_col)
            .agg(F.min("_t").alias(f"_s{i}"))
        )
        frames.append(cur)
    counts = [
        f.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            F.col("n").cast("bigint").alias("n_users"),
        )
        for i, f in enumerate(frames)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly retention matrix: users cohorted by their first-activity
    week, counted once per (cohort_week, week_offset) they were active in
    — the classic triangle. Integer week offsets via day-difference div 7
    (exact, both engines).

    Two groupBys on the user key share one partitioning (first-activity
    min, then the distinct user-week set); the matrix aggregate runs over
    user-week rows, already tiny. Offset 0 is the cohort size."""
    cohort = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = (
        df.select(
            F.col(user_col),
            F.date_trunc("week", F.col(ts_col)).alias("_week"),
        )
        .distinct()
    )
    j = active.join(cohort, user_col)
    return (
        j.select(
            "cohort_week",
            (F.datediff(F.col("_week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


def activity_streaks(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Longest run of CONSECUTIVE active days per user (gaps-and-islands):
    (user, n_active_days, longest_streak), all exact integers.

    The classic trick: over the distinct (user, day) frame, ``day_number -
    row_number`` is constant within a consecutive run, so one groupBy on
    that anchor measures each island and a final max picks the longest.

    Scale shape: the only corpus-sized op is the distinct, which partial-
    aggregates map-side; every window/group after it runs on user-day rows
    (bounded by users x days, not by events). The window partitions by
    user — no global sort, and a power user costs one partition's sort of
    at most "days in corpus" rows.
    """
    days = (
        df.select(
            F.col(user_col),
            F.to_date(F.col(ts_col)).alias("_day"),
        )
        .distinct()
    )
    w = Window.partitionBy(user_col).orderBy("_day")
    anchored = days.select(
        user_col,
        "_day",
        (F.datediff("_day", F.lit("1970-01-01")) - F.row_number().over(w)).alias(
            "_anchor"
        ),
    )
    islands = anchored.groupBy(user_col, "_anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("_run")
    )
    return islands.groupBy(user_col).agg(
        F.sum("_run").cast("bigint").alias("n_active_days"),
        F.max("_run").cast("bigint").alias("longest_streak"),
    )


def corr_moments(
    df: DataFrame,
    key_col: str,
    x: Column,
    y: Column,
    ppm_out: str = "r2_ppm",
) -> DataFrame:
    """Distributed Pearson correlation as MERGEABLE exact integer moments.

    Emits per key: n, sum_x, sum_y, sum_xy, sum_x2, sum_y2 (bigint-exact,
    associative — this is how correlation distributes: each partition's
    moments merge by addition, the same contract as the HLL/CM sketches)
    plus ``r2_ppm``, the squared correlation in parts-per-million derived
    from the exact moments with a FIXED double expression — deterministic
    because every engine evaluates identical IEEE ops on identical
    integers (the star-schema cents discipline, applied to moments).

    ``x``/``y`` must already be integer-typed columns (quantize first).
    """
    xx, yy = x.cast("bigint"), y.cast("bigint")
    agg = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(xx).alias("sum_x"),
        F.sum(yy).alias("sum_y"),
        F.sum(xx * yy).alias("sum_xy"),
        F.sum(xx * xx).alias("sum_x2"),
        F.sum(yy * yy).alias("sum_y2"),
    )
    # identical text on the oracle side (CORR_PPM_SQL) — keep in sync
    return agg.withColumn(
        ppm_out,
        F.expr(
            "CASE WHEN cast(n as double) * cast(sum_x2 as double)"
            "          - cast(sum_x as double) * cast(sum_x as double) > 0"
            "      AND cast(n as double) * cast(sum_y2 as double)"
            "          - cast(sum_y as double) * cast(sum_y as double) > 0 THEN"
            " cast(floor("
            "   (cast(n as double) * cast(sum_xy as double)"
            "    - cast(sum_x as double) * cast(sum_y as double))"
            "   * (cast(n as double) * cast(sum_xy as double)"
            "      - cast(sum_x as double) * cast(sum_y as double))"
            "   / ((cast(n as double) * cast(sum_x2 as double)"
            "       - cast(sum_x as double) * cast(sum_x as double))"
            "      * (cast(n as double) * cast(sum_y2 as double)"
            "         - cast(sum_y as double) * cast(sum_y as double)))"
            "   * 1000000) as bigint) END"
        ),
    )


def state_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
) -> DataFrame:
    """SCD2-style validity intervals: per key, each event opens an interval
    of its state that closes when the NEXT event arrives (half-open
    [valid_from, valid_to), NULL valid_to = still current). The temporal-
    table pattern warehouses derive from change streams.

    One window per key ordered by (ts, state) — the state tiebreak makes
    simultaneous events deterministic. No self-join: lead() closes each
    interval in the same pass.

    Scale shape: one shuffle on the key column; a hot key costs one
    partition sort (the window never crosses keys). Consecutive SAME-state
    events are kept as separate intervals (pure lead semantics — collapse
    with islands logic if change-only compaction is wanted).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, state_col)
    return df.select(
        key_col,
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact weighted median per group: the smallest value at which the
    running weight (ordered by value) reaches half the group's total —
    selection, not interpolation, so integer inputs give integer-exact,
    engine-independent output. The corpus-statistics use: "the document
    length below which half the corpus's characters live" drives chunk
    sizing.

    Two windows over the same (group, value) ordering share one shuffle;
    ties on value are absorbed by ordering on value alone (the running sum
    at the LAST row of a tie group decides, both engines agree because the
    frame is RANGE — value-based — not ROWS).
    """
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    scored = df.select(
        group_col,
        F.col(value_col).alias("_v"),
        F.col(weight_col).alias("_w"),
    ).select(
        group_col,
        "_v",
        F.sum("_w").over(w_ord).alias("_cum"),
        F.sum("_w").over(w_all).alias("_tot"),
    )
    hit = scored.filter(F.col("_cum") * 2 >= F.col("_tot"))
    return hit.groupBy(group_col).agg(
        F.min("_v").cast("bigint").alias("weighted_median"),
        F.max("_tot").cast("bigint").alias("total_weight"),
    )


def pareto_frontier(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """2-D Pareto skyline: rows no other row dominates (other.x >= x AND
    other.y >= y with at least one strict). O(n log n) via two windows —
    NEVER the quadratic NOT-EXISTS self-join (which is exactly what the
    DuckDB oracle runs, making the two formulations check each other):

    - dominated by a strictly-larger-x row iff ``max(y) over (x' > x) >= y``
      (RANGE frame excluding the current x value),
    - dominated within the same x iff ``max(y) over (x' == x) > y``.

    Duplicate (x, y) pairs do NOT dominate each other (no strict edge) —
    both survive, matching the NOT-EXISTS semantics.

    Scale shape: the exact windows are global (single-partition sort), so
    a distributed PRE-PRUNE runs first — fixed-width x-buckets, per-bucket
    max y (one partial-aggregated groupBy), and every row dominated by a
    strictly-higher bucket's max is dropped map-side via a broadcast of
    the tiny bucket frame. Rows in a higher bucket have strictly greater x
    by construction, so the prune is sound; the survivors (a frontier-ish
    sliver) are what the global window sorts.
    """
    pts = df.select(
        F.col(id_col),
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    )
    bucketed = pts.withColumn("_b", F.expr("x div 1024"))
    bmax = bucketed.groupBy("_b").agg(F.max("y").alias("_by"))
    w_b = (
        Window.orderBy(F.col("_b").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # max y over strictly higher buckets; bucket frame is tiny (x range / 1024)
    higher = bmax.select("_b", F.max("_by").over(w_b).alias("_hi"))
    candidates = (
        bucketed.join(F.broadcast(higher), "_b")
        .filter(F.col("_hi").isNull() | (F.col("_hi") < F.col("y")))
        .drop("_b", "_hi")
    )
    w_gt = (
        Window.partitionBy()
        .orderBy(F.col("x").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("x")
    scored = candidates.select(
        id_col,
        "x",
        "y",
        F.max("y").over(w_gt).alias("_y_gt"),
        F.max("y").over(w_eq).alias("_y_eq"),
    )
    return scored.filter(
        (F.col("_y_gt").isNull() | (F.col("_y_gt") < F.col("y")))
        & (F.col("_y_eq") <= F.col("y"))
    ).select(id_col, "x", "y")


def span_red_metrics(
    spans: DataFrame,
    bounds_ms: list[int],
    keys: tuple[str, ...] = ("service_name", "name"),
    with_exemplar: bool = False,
) -> DataFrame:
    """RED metrics derived from spans (the spanmetrics-connector shape:
    Rate/Errors/Duration per (service, operation) — the metrics side of
    the span transport, the same derivation tracing backends run): calls,
    error count + integer per-mille rate, total duration, and cumulative
    Prometheus-style ``le_<bound>ms`` histogram counts over EXPLICIT
    bounds (the OTLP explicit-bounds histogram of model/pdata/metrics.go
    with the +Inf bucket == calls).

    One partial-aggregated groupBy — every bucket is a conditional sum
    inside the same aggregate, so the corpus is scanned once and the
    shuffle carries one row per (service, operation). All comparisons on
    integer micros; err_pm floor-divided remainder-first so both engines
    agree exactly.

    ``with_exemplar=True`` adds the OTLP-exemplar analog (the datapoint
    attachment of metrics.pb.go's histogram exemplars): the SLOWEST span's
    (trace_id, span_id, duration) per group, as one more max_by inside the
    same aggregate — ties broken by the (duration_us, trace_id, span_id)
    struct order, a stated rule. Requires trace_id/span_id columns.
    """
    if not bounds_ms or any(b <= 0 for b in bounds_ms):
        raise ValueError(f"bounds_ms must be positive, got {bounds_ms}")
    if sorted(bounds_ms) != list(bounds_ms) or len(set(bounds_ms)) != len(bounds_ms):
        raise ValueError(f"bounds_ms must be strictly ascending, got {bounds_ms}")
    err = (F.col("status_code") == 2).cast("bigint")
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("calls"),
        F.sum(err).cast("bigint").alias("errors"),
        F.sum("duration_us").cast("bigint").alias("duration_sum_us"),
    ]
    for b in bounds_ms:
        aggs.append(
            F.sum((F.col("duration_us") <= F.lit(int(b) * 1000)).cast("bigint"))
            .cast("bigint")
            .alias(f"le_{b}ms")
        )
    if with_exemplar:
        slowest = F.struct(
            F.col("duration_us"), F.col("trace_id"), F.col("span_id")
        )
        aggs.append(
            F.max_by(
                F.struct(
                    F.col("trace_id").alias("trace_id"),
                    F.col("span_id").alias("span_id"),
                    F.col("duration_us").alias("duration_us"),
                ),
                slowest,
            ).alias("exemplar")
        )
    out = spans.groupBy(*keys).agg(*aggs)
    e1000 = F.col("errors") * F.lit(1000)
    return out.withColumn(
        "err_pm", ((e1000 - F.pmod(e1000, F.col("calls"))) / F.col("calls")).cast("bigint")
    )


def counter_rate(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """PromQL-style counter rate: per-series increase per fixed window with
    reset handling (``rate()``/``increase()`` semantics: a counter that
    goes DOWN restarted from zero, so the post-reset sample contributes its
    own value as the increase — one step past :func:`adjust_cumulative`,
    whose adjuster emits no delta for a reset point). The series-first
    sample has no baseline and contributes nothing. Each adjacent-sample
    increase is attributed to the window of the LATER sample (a stated
    rule; PromQL's sliding range vectors have no batch analog).

    Output per (keys, window bucket): ``increase`` (sum of increases,
    NULL when the window holds only baseline-less samples), ``n_deltas``,
    and ``rate_milli_per_s`` = floor(increase * 1000 / window_seconds),
    remainder-first so both engines agree exactly on non-negative counters.

    Physical shape: the lag window shares adjust_cumulative's single
    hashpartitioning(keys) exchange over the corpus; the bucket aggregate
    is a second, partial-aggregated shuffle of per-window rows.
    """
    if window_seconds <= 0:
        raise ValueError(f"window_seconds must be positive, got {window_seconds}")
    adj = adjust_cumulative(df, keys, ts_col=ts_col, value_col=value_col, tiebreak=tiebreak)
    inc = F.coalesce(
        F.col("delta"),
        F.when(F.col("is_reset"), F.col(value_col)),
    )
    window_us = int(window_seconds) * 1_000_000
    ts_us = F.unix_micros(F.to_utc_timestamp(F.col(ts_col), "UTC"))
    bucket = ((ts_us - ts_us % F.lit(window_us)) / F.lit(window_us)).cast("bigint")
    out = (
        adj.select(*keys, bucket.alias("bucket"), inc.alias("_inc"))
        .groupBy(*keys, "bucket")
        .agg(
            F.sum("_inc").cast("bigint").alias("increase"),
            F.count("_inc").cast("bigint").alias("n_deltas"),
        )
    )
    # 128-bit floor arithmetic: increase*1000 overflows bigint for a
    # window holding > ~9.2e15 integer units (found by the differential
    # fuzz), so the scaling happens in DECIMAL(38,0); pmod (not %) keeps
    # FLOOR semantics for negative increases (a reset landing on a
    # negative-valued series) — DuckDB's % truncates, so the oracle
    # floor-adjusts its modulo explicitly. A rate too large for bigint is
    # NULL, not an overflow error (junk isolates per-row).
    w = int(window_seconds)
    num = F.expr("CAST(increase AS DECIMAL(38,0)) * 1000")
    q = (num - F.pmod(num, F.lit(w))) / F.lit(w)
    return out.withColumn(
        "rate_milli_per_s",
        F.when(F.abs(q) <= F.lit(9223372036854775807).cast("decimal(38,0)"), q)
        .cast("bigint"),
    )


def span_self_times(spans: DataFrame) -> DataFrame:
    """Flame-graph self-time attribution per span: wall duration minus the
    summed durations of DIRECT children (the bottleneck-attribution
    number tracing UIs aggregate — where time is actually spent, not
    where it is inherited from). Children overlap or run async in real
    traces, so a parent's children can sum past its own duration: self
    time clamps at zero and ``over_parallel`` flags it (int), keeping the
    raw child sum available.

    Physical shape: ONE partial-aggregated groupBy(trace_id,
    parent_span_id) reduces the corpus to per-parent child sums, then ONE
    equi-join back on (trace_id, span_id) — both AQE-planned hash
    shuffles on trace-local keys, never a nested loop. Frame contract:
    trace_id, span_id, parent_span_id, duration_us.
    """
    # rename BOTH join keys: the child frame derives from the same spans
    # plan, so spans["trace_id"] == child["trace_id"] would resolve to the
    # trivially-true self-comparison (the classic self-join ambiguity trap)
    child = (
        spans.filter(F.col("parent_span_id").isNotNull() & (F.col("parent_span_id") != ""))
        .groupBy("trace_id", "parent_span_id")
        .agg(F.sum("duration_us").cast("bigint").alias("child_sum_us"))
        .select(
            F.col("trace_id").alias("_join_trace_id"),
            F.col("parent_span_id").alias("_join_span_id"),
            "child_sum_us",
        )
    )
    out = spans.join(
        child,
        (F.col("trace_id") == F.col("_join_trace_id"))
        & (F.col("span_id") == F.col("_join_span_id")),
        "left",
    ).drop("_join_trace_id", "_join_span_id")
    child_sum = F.coalesce(F.col("child_sum_us"), F.lit(0))
    return out.withColumn("child_sum_us", child_sum).withColumn(
        "self_us", F.greatest(F.lit(0), F.col("duration_us") - child_sum).cast("bigint")
    ).withColumn("over_parallel", (child_sum > F.col("duration_us")).cast("int"))


def winsorize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    low_pm: int = 10,
    high_pm: int = 990,
) -> DataFrame:
    """Per-key winsorization at exact discrete percentiles: clip every
    value into ``[P(low_pm/1000), P(high_pm/1000)]`` of its own key group
    — the outlier-robust normalization a feature pipeline runs before any
    mean/variance statistic (the at-rest cousin of the memory-limiter's
    drop-the-extremes instinct). ``P(p)`` is the value at ascending
    position ``ceil(p * n)`` (percentile-disc, never interpolated), so
    bounds are actual observed values and integer-exact across engines.

    Physical shape: everything is window arithmetic on ONE
    ``hashpartitioning(keys)`` exchange — an ordering window assigns ranks,
    partition windows count and then lift the two bound candidates to every
    row; no join, no second scan, no corpus re-sort. Values are compared in
    cents (``floor(value*100)``); equal values make rank assignment
    ambiguous but the selected BOUND is identical under any tie order, so
    outputs are engine-exact.

    NULL values isolate per-row (NULL in, NULL out) and are excluded from
    every rank/count; NULL never becomes a bound.

    Returns the input columns plus ``value_cents``, ``lo_cents``,
    ``hi_cents``, ``winsorized_cents``.
    """
    if not keys:
        raise ValueError("at least one key column is required")
    if not (0 <= low_pm < high_pm <= 1000):
        raise ValueError(f"need 0 <= low_pm < high_pm <= 1000, got {low_pm}, {high_pm}")
    wp = Window.partitionBy(*keys)
    wo = wp.orderBy(F.col("_vc").asc_nulls_first())
    d = df.withColumn("_vc", F.floor(F.col(value_col) * 100).cast("bigint"))
    d = d.select(
        "*",
        F.row_number().over(wo).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n_total"),
        F.count("_vc").over(wp).alias("_n"),
    )
    # non-null rows occupy ranks (n_total - n + 1)..n_total (nulls first);
    # renumber them 1.._n, then pick the ceil(p*n) candidates
    d = d.select(
        "*",
        (F.col("_rn") - (F.col("_n_total") - F.col("_n"))).alias("_rnn"),
        F.greatest(F.expr(f"({low_pm} * _n + 999) div 1000"), F.lit(1).cast("bigint")).alias("_lo_pos"),
        F.greatest(F.expr(f"({high_pm} * _n + 999) div 1000"), F.lit(1).cast("bigint")).alias("_hi_pos"),
    )
    d = d.select(
        "*",
        F.min(F.when(F.col("_rnn") == F.col("_lo_pos"), F.col("_vc"))).over(wp).alias("lo_cents"),
        F.min(F.when(F.col("_rnn") == F.col("_hi_pos"), F.col("_vc"))).over(wp).alias("hi_cents"),
    )
    return d.select(
        *df.columns,
        F.col("_vc").alias("value_cents"),
        "lo_cents",
        "hi_cents",
        # explicit NULL gate: greatest/least SKIP null operands in both
        # engines, which would resurrect a NULL value as the lower bound
        F.when(
            F.col("_vc").isNotNull(),
            F.least(F.greatest(F.col("_vc"), F.col("lo_cents")), F.col("hi_cents")),
        )
        .cast("bigint")
        .alias("winsorized_cents"),
    )


def key_skew_report(df: DataFrame, keys: list[str], top_k: int = 20) -> DataFrame:
    """Hot-key skew report: the top-``top_k`` key tuples by row count with
    each one's per-mille share, cumulative share, and the corpus-wide
    Herfindahl-Hirschman concentration (HHI, in ppm) — the measurement
    that DECIDES whether the salting / AQE-skew machinery
    (:func:`turn_counts` ``salt_buckets``, DEPLOY.md sizing rules) is
    needed before anyone pays for it. HHI == 1e6 means one key owns the
    corpus; ~1e6/n_keys means uniform.

    Physical shape: one partial-aggregated groupBy(keys) builds the count
    frame; the top-k is ``TakeOrderedAndProject`` (each task forwards only
    its local k — the full distinct-key frame is never sorted or
    collected); totals + sum-of-squares reduce to ONE row that cross-joins
    (broadcast) onto the k rows. HHI's cnt² x 1e6 over total² needs
    128-bit intermediates: DECIMAL(38,0) ``div`` — exact integral
    quotient in both engines, no float anywhere. Ties order by the key
    tuple ascending, so rank is total and engine-stable.

    Returns (keys..., n_rows, rank, share_pm, cum_share_pm, hhi_ppm).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if not keys:
        raise ValueError("at least one key column is required")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_total"),
        F.sum(F.expr("CAST(n_rows AS DECIMAL(38,0)) * n_rows")).alias("_sumsq"),
    )
    order = [F.col("n_rows").desc(), *[F.col(k).asc() for k in keys]]
    top = counts.orderBy(*order).limit(top_k)
    wr = Window.orderBy(*order)
    wc = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "n_rows",
            F.row_number().over(wr).cast("bigint").alias("rank"),
            F.expr("1000 * n_rows div _total").cast("bigint").alias("share_pm"),
            (F.lit(1000) * F.sum("n_rows").over(wc))
            .cast("bigint")
            .alias("_cum"),
            F.expr(
                "CAST(1000000 AS DECIMAL(38,0)) * _sumsq"
                " div (CAST(_total AS DECIMAL(38,0)) * _total)"
            )
            .cast("bigint")
            .alias("hhi_ppm"),
            F.col("_total"),
        )
        .select(
            *keys,
            "n_rows",
            "rank",
            "share_pm",
            F.expr("_cum div _total").cast("bigint").alias("cum_share_pm"),
            "hhi_ppm",
        )
    )


def equi_depth_bins(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    n_bins: int = 10,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Per-key equi-depth (quantile) binning: each row gets a bucket
    ``1..n_bins`` so that buckets hold (near-)equal populations — the
    discretization feature pipelines feed to tree models and the bucket
    scheme behind percentile-bucketed monitoring dashboards. Sibling of
    :func:`winsorize` (same rank machinery; clipping vs labelling).

    Bin is pure integer arithmetic on the rank: ``(rank-1) * n_bins div n
    + 1`` — deterministic in both engines, unlike ``ntile`` whose
    remainder-distribution rule needn't be replayed. Rows order by
    ``(value_cents, *tiebreak)``; pass a unique tiebreak so equal values
    bin identically across engines when a bucket boundary splits a tie
    run. NULL values isolate per-row (bin NULL, excluded from every
    rank/count) via the nulls-first renumbering.

    ONE ``hashpartitioning(keys)`` exchange (rank + count windows, no
    join). Returns input columns + ``value_cents`` + ``bin``.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if not keys:
        raise ValueError("at least one key column is required")
    tb = list(tiebreak or [])
    wp = Window.partitionBy(*keys)
    wo = wp.orderBy(F.col("_vc").asc_nulls_first(), *[F.col(c) for c in tb])
    d = df.withColumn("_vc", F.floor(F.col(value_col) * 100).cast("bigint"))
    d = d.select(
        "*",
        F.row_number().over(wo).alias("_rn"),
        F.count(F.lit(1)).over(wp).alias("_n_total"),
        F.count("_vc").over(wp).alias("_n"),
    )
    return d.select(
        *df.columns,
        F.col("_vc").alias("value_cents"),
        F.when(
            F.col("_vc").isNotNull(),
            F.expr(f"(_rn - (_n_total - _n) - 1L) * {n_bins} div _n + 1L"),
        )
        .cast("int")
        .alias("bin"),
    )


def trend_slope(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key OLS trend line in EXACT integer arithmetic — the
    capacity-planning number ("is this series growing, how fast") every
    metrics backend fits over the volumes the collector transports. Over
    integer (x, y) the least-squares slope is the exact rational
    ``(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)``; both sides accumulate as
    associative integer sums (the :func:`corr_moments` trick — mergeable,
    partitioning-independent) and the division happens ONCE at the end in
    DECIMAL(38,0) ``div``, so slope_ppm is bit-identical across engines.

    Returns per key: ``n``, the five moment sums, ``slope_ppm`` (slope ×
    1e6, NULL when x is constant — a vertical fit has no slope) and
    ``intercept_ppm`` (``(Σy·Σx² − Σx·Σxy) × 1e6 div den``, same NULL
    rule). One partial-aggregated groupBy; NULL x/y rows isolate per-row.

    Scale shape: moments compress each task to one row per key map-side —
    the same bound as any counting aggregate; nothing downstream touches
    the corpus.
    """
    if not keys:
        raise ValueError("at least one key column is required")
    d = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        *keys,
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    m = d.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_x").cast("bigint").alias("sum_x"),
        F.sum("_y").cast("bigint").alias("sum_y"),
        F.sum(F.expr("CAST(_x AS DECIMAL(38,0)) * _y")).alias("_sxy"),
        F.sum(F.expr("CAST(_x AS DECIMAL(38,0)) * _x")).alias("_sx2"),
    )
    num = "(CAST(n AS DECIMAL(38,0)) * _sxy - CAST(sum_x AS DECIMAL(38,0)) * sum_y)"
    den = "(CAST(n AS DECIMAL(38,0)) * _sx2 - CAST(sum_x AS DECIMAL(38,0)) * sum_x)"
    inum = "(CAST(sum_y AS DECIMAL(38,0)) * _sx2 - CAST(sum_x AS DECIMAL(38,0)) * _sxy)"

    def trunc_div(a: str, b: str) -> str:
        # explicit truncation toward zero via abs + sign: signed integral
        # division TRUNCATES in Spark but FLOORS in DuckDB — a declining
        # series (negative slope) would disagree by 1 without this
        return (
            f"CASE WHEN ({a} < 0) = ({b} < 0) THEN abs({a}) div abs({b})"
            f" ELSE -(abs({a}) div abs({b})) END"
        )

    return m.select(
        *keys,
        "n",
        "sum_x",
        "sum_y",
        F.col("_sxy").cast("bigint").alias("sum_xy"),
        F.col("_sx2").cast("bigint").alias("sum_x2"),
        F.expr(
            f"CASE WHEN {den} <> 0 THEN {trunc_div(f'(1000000 * {num})', den)} END"
        ).cast("bigint").alias("slope_ppm"),
        F.expr(
            f"CASE WHEN {den} <> 0 THEN {trunc_div(f'(1000000 * {inum})', den)} END"
        ).cast("bigint").alias("intercept_ppm"),
    )


def rank_normalize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
) -> DataFrame:
    """Per-key empirical-CDF feature transform: each row's value mapped to
    its min-rank position in per-mille of the key's population — the
    rank/quantile normalization feature pipelines apply before models that
    want uniform marginals (sibling of :func:`equi_depth_bins`; continuous
    label instead of a bucket).

    Uses ``rank()`` (min-rank), NOT ``row_number``: tied values share a
    rank in BOTH engines by definition, so the output is deterministic
    with no tiebreak column at all — the tie run maps to one cdf value.
    ``cdf_pm = 1000 * rank div n`` (integer floor-division, engine-exact;
    the maximum value always maps to 1000 when untied). NULL values
    isolate per-row via the nulls-first renumbering (NULL in, NULL out,
    excluded from every rank/count). ONE ``hashpartitioning(keys)``
    exchange, no join.

    Returns the input columns plus ``value_cents`` and ``cdf_pm``.
    """
    if not keys:
        raise ValueError("at least one key column is required")
    wp = Window.partitionBy(*keys)
    wo = wp.orderBy(F.col("_vc").asc_nulls_first())
    d = df.withColumn("_vc", F.floor(F.col(value_col) * 100).cast("bigint"))
    d = d.select(
        "*",
        F.rank().over(wo).alias("_rk"),
        F.count(F.lit(1)).over(wp).alias("_n_total"),
        F.count("_vc").over(wp).alias("_n"),
    )
    return d.select(
        *df.columns,
        F.col("_vc").alias("value_cents"),
        F.when(
            F.col("_vc").isNotNull(),
            F.expr("1000 * (_rk - (_n_total - _n)) div _n"),
        )
        .cast("bigint")
        .alias("cdf_pm"),
    )
