"""Pipeline-hygiene processors: integrity audit, repeated-line dedup, rate limit.

The reference collector trusts its receivers to deliver well-formed,
in-order batches — its only defenses are the per-component obsreport
counters (internal/obsreportconfig/obsmetrics/obs_processor.go:24-77) and
sampled logging on hot error paths (exporter/exporterhelper/
queued_retry.go:110-127). A batch pipeline over 10^12 stored turns cannot
assume that: late/replayed writers corrupt turn ordering, retry storms
duplicate log lines, and hot producers flood a key. These three operators
are the batch analogs of the hygiene stages a production log pipeline runs
between parse and route:

- :func:`integrity_audit` — per-conversation data-quality flags (duplicate
  / missing / NULL ``turn_idx``, role echo, timestamp regression). It
  turns the north_rule's stable ``(conv_id, turn_idx)`` ordering invariant
  from an assumption into a measurable, routable signal.
- :func:`log_dedup` — suppress repeated identical lines per key and emit
  the first occurrence plus a repeat count (the contrib logdedup-processor
  contract; the reference core's closest relative is its sampled error
  logging above).
- :func:`rate_limit` — keep at most ``k`` records per (key, time-window):
  quota head-sampling, complementing the probabilistic sampler's hash
  sampling (processor/probabilisticsamplerprocessor/
  probabilisticsampler.go:72-102) when a *deterministic per-key cap* is
  wanted instead of a corpus-wide rate.

Scale notes (the reason each op is shaped the way it is):

- All three shuffle exactly once, on the conversation key (plus fingerprint
  / window bucket), i.e. the same ``hashpartitioning(conv_id)`` the
  aggregate stage already uses — a pipeline composing them can reuse one
  partitioning across stages.
- ``log_dedup`` is a groupBy, NOT a window over the raw stream: partial
  aggregation collapses duplicate lines map-side, so a retry storm that
  duplicates a line 10^6 times ships ONE partial row per task through the
  shuffle — exactly why the processor exists at 10^12 rows.
- ``rate_limit`` filters ``row_number() <= k`` with nothing else in the
  window, so Spark rewrites it to a Partial WindowGroupLimit: each map
  task forwards at most k rows per (key, window) and the shuffle is
  O(k · keys · windows), never the corpus.

Per-row junk policy (repo-wide): NULL keys/timestamps degrade per-row,
never per-job — NULL ``turn_idx`` is counted in its own audit column, and
NULL ``ts`` rows form their own rate-limit bucket per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "integrity_audit",
    "log_dedup",
    "rate_limit",
    "log_templates",
    "sliding_window_counts",
    "trending_templates",
]

#: audit columns that must all be zero for a conversation to be ``clean``
AUDIT_FLAGS = ("n_dup_idx", "n_gaps", "n_null_idx", "n_role_echo", "n_ts_regress")


def _bigint(c: Column) -> Column:
    return c.cast("bigint")


def integrity_audit(
    df: DataFrame,
    key_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key data-quality audit of the stable-ordering invariant.

    Emits one row per ``key_col`` with::

        n_turns       rows seen
        n_dup_idx     non-NULL ``idx_col`` values claimed by >1 row
        n_gaps        missing positions in [min(idx), max(idx)]
        n_null_idx    rows whose ``idx_col`` is NULL (per-row junk, counted
                      separately so it never poisons the dup/gap math)
        n_role_echo   rows whose role equals the previous row's role under
                      the total order (idx, ts, role)
        n_ts_regress  rows whose ts is EARLIER than the previous row's ts
                      under that order (replayed / backdated writers)
        clean         1 iff every flag above is 0

    The lag pass and the aggregate share one
    ``hashpartitioning(key_col)`` exchange: the window partitions by the
    key, and the groupBy on the same key reuses that partitioning (no
    second shuffle). The order (idx, ts, role) is total on any input whose
    (idx, ts) ties share a role — and on inputs with full duplicate rows
    the lag comparisons are tie-invariant anyway — so the flags are
    deterministic, which the DuckDB oracle (q69) relies on. NULL values
    order FIRST on every sort key (Spark's ascending default); the oracle
    spells NULLS FIRST explicitly because DuckDB defaults to NULLS LAST.
    """
    order = [F.col(idx_col).asc_nulls_first(), ts_col, role_col]
    w = Window.partitionBy(key_col).orderBy(*order)
    echo = (F.col(role_col) == F.lag(role_col).over(w)).cast("int")
    regress = (F.col(ts_col) < F.lag(ts_col).over(w)).cast("int")
    staged = df.select(key_col, idx_col, role_col, ts_col).select(
        key_col,
        idx_col,
        echo.alias("_echo"),
        regress.alias("_regress"),
    )
    idx = F.col(idx_col)
    n_distinct = F.countDistinct(idx)
    out = staged.groupBy(key_col).agg(
        _bigint(F.count(F.lit(1))).alias("n_turns"),
        _bigint(F.count(idx) - n_distinct).alias("n_dup_idx"),
        _bigint(
            F.coalesce(F.max(idx) - F.min(idx) + 1 - n_distinct, F.lit(0))
        ).alias("n_gaps"),
        _bigint(F.count(F.lit(1)) - F.count(idx)).alias("n_null_idx"),
        _bigint(F.coalesce(F.sum("_echo"), F.lit(0))).alias("n_role_echo"),
        _bigint(F.coalesce(F.sum("_regress"), F.lit(0))).alias("n_ts_regress"),
    )
    clean = F.lit(1)
    for flag in AUDIT_FLAGS:
        clean = clean.bitwiseAND(F.when(F.col(flag) == 0, 1).otherwise(0))
    return out.select("*", _bigint(clean).alias("clean"))


def log_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id",),
    text_col: str = "text",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Suppress repeated identical lines per key; emit first occurrence + count.

    Output: one row per (keys, distinct ``text_col``) carrying the FIRST
    occurrence's (idx, ts, role) under the total order (idx, ts, role),
    the text and its md5 fingerprint, ``n_occurrences``, and ``last_idx``
    (the final position the line was seen at — the logdedup processor's
    "last observed" timestamp analog).

    Grouping is on ``md5(text)`` alongside the key so the shuffle hashes a
    16-byte digest, not arbitrary-length text, and partial aggregation
    collapses duplicates map-side (a 10^6-line retry storm ships one
    partial row per task). The first occurrence rides the aggregate as
    ``min(struct(idx, ts, role, text))`` — no join-back, no window over
    the raw stream; text is constant within a group, so carrying it in the
    struct is free and exact. Spark's struct ordering treats a NULL field
    as SMALLEST, so a NULL-idx junk row wins "first occurrence" over any
    indexed row; the oracle's row_number window pins the same order with
    explicit NULLS FIRST (DuckDB defaults to NULLS LAST).
    """
    fp = F.md5(F.col(text_col)).alias("text_fp")
    first = F.min(F.struct(idx_col, ts_col, role_col, text_col)).alias("_first")
    grouped = df.groupBy(*keys, fp).agg(
        first,
        _bigint(F.count(F.lit(1))).alias("n_occurrences"),
        F.max(idx_col).alias("last_idx"),
    )
    return grouped.select(
        *keys,
        F.col(f"_first.{idx_col}").alias(idx_col),
        F.col(f"_first.{ts_col}").alias(ts_col),
        F.col(f"_first.{role_col}").alias(role_col),
        F.col(f"_first.{text_col}").alias(text_col),
        "text_fp",
        "n_occurrences",
        "last_idx",
    )


def rate_limit(
    df: DataFrame,
    keys: Sequence[str] = ("conv_id",),
    ts_col: str = "ts",
    max_per_window: int = 1000,
    window: str = "hour",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Keep at most ``max_per_window`` rows per (keys, ``window`` of ts).

    The survivors are the FIRST ``k`` rows of each (key, window bucket)
    under the total order (ts, idx, role) — a deterministic per-key quota,
    not a probabilistic rate. ``window`` is any ``date_trunc`` unit
    (``minute``/``hour``/``day``/...). Output keeps the input columns plus
    ``window_start`` (the truncated bucket timestamp).

    The ``row_number() <= k`` filter is the ONLY consumer of the window,
    so Spark plans a Partial WindowGroupLimit upstream of the exchange:
    each map task emits at most k rows per bucket and the shuffle carries
    O(k · keys · buckets) rows regardless of input size (asserted in
    tests/test_hygiene.py). NULL ``ts`` rows truncate to a NULL bucket and
    are quota'd among themselves per key — junk rows are bounded, never
    job-fatal.

    ``max_per_window`` must be >= 1 (a 0-quota "drop everything" is a
    filter, not a limiter — refuse it loudly rather than planning a
    degenerate window).
    """
    if max_per_window < 1:
        raise ValueError(f"max_per_window must be >= 1, got {max_per_window}")
    bucket = F.date_trunc(window, F.col(ts_col))
    w = Window.partitionBy(*[F.col(k) for k in keys], bucket).orderBy(
        F.col(ts_col).asc_nulls_first(), idx_col, role_col
    )
    ranked = df.select("*", bucket.alias("window_start"), F.row_number().over(w).alias("_rn"))
    return ranked.filter(F.col("_rn") <= max_per_window).drop("_rn")


def log_templates(
    df: DataFrame,
    keys: Sequence[str] = ("role",),
    text_col: str = "text",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Log-template mining: cluster lines into Drain-style templates by
    masking the variable fields, and report each template's volume.

    The discovery complement of the grok/extract parse stage
    (``processor/processorhelper/attraction.go:265-285`` applies KNOWN
    patterns; this op finds the patterns a corpus actually contains — the
    step an operator runs BEFORE writing the grok pack). Deterministic
    masking in place of Drain's online tree (a batch engine wants a pure
    function of the line, reproducible across engines): hex runs of >= 8
    chars become ``<HEX>`` (trace/span/request ids), then digit runs
    become ``<N>``. Both patterns mean the same thing in Java regex, RE2,
    and DuckDB.

    Output: one row per (keys, template) with the template text and its
    md5 fingerprint, ``n_lines``, ``n_variants`` (distinct raw lines the
    template covers), and the FIRST occurrence (idx, ts, example text)
    under the (idx, ts, text) total order.

    Same physical shape as :func:`log_dedup`: groupBy on the 16-byte
    template digest (never raw text through the shuffle), partial
    aggregation collapses each task to its distinct templates map-side,
    first occurrence rides the aggregate as ``min(struct(...))`` — no
    window over the raw stream, no join-back. countDistinct adds the
    usual expand re-aggregation on the SAME partitioning (no extra
    exchange).
    """
    tmpl = F.regexp_replace(
        F.regexp_replace(F.col(text_col), "[0-9a-fA-F]{8,}", "<HEX>"), "[0-9]+", "<N>"
    )
    d = df.select(
        *keys, F.col(idx_col), F.col(ts_col), F.col(text_col), tmpl.alias("template")
    )
    grouped = d.groupBy(*keys, F.md5("template").alias("template_fp")).agg(
        F.min(F.struct(idx_col, ts_col, text_col, "template")).alias("_first"),
        _bigint(F.count(F.lit(1))).alias("n_lines"),
        _bigint(F.countDistinct(F.md5(text_col))).alias("n_variants"),
    )
    return grouped.select(
        *keys,
        F.col("_first.template").alias("template"),
        "template_fp",
        "n_lines",
        "n_variants",
        F.col(f"_first.{idx_col}").alias("first_idx"),
        F.col(f"_first.{ts_col}").alias("first_ts"),
        F.col(f"_first.{text_col}").alias("example"),
    )


def trending_templates(
    df: DataFrame,
    split_ts: str,
    keys: Sequence[str] = ("role",),
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Template-volume drift across a time split: for every
    :func:`log_templates` template, its line count BEFORE vs AFTER
    ``split_ts`` plus an integer lift ratio and a new-template flag — the
    "did a new error class appear / did a known one surge" report an
    on-call pages on (the alerting complement of q90's static template
    inventory; the reference's nearest relative is the error-rate deltas
    its obsreport counters expose per component,
    ``internal/obsreportconfig/obsmetrics/obs_processor.go:24-77``).

    ``split_ts`` is an ISO timestamp string (compared half-open: prev
    ``ts < split_ts``, cur ``ts >= split_ts``; NULL ts counts in neither).
    Output per (keys, template): ``n_prev``, ``n_cur``,
    ``lift_ppm = 1e6 * n_cur div max(n_prev, 1)`` (integer floor-division
    — engine-exact; against a floor of 1 so brand-new templates still get
    a finite magnitude) and ``is_new = (n_prev == 0)``.

    Physical shape: ONE digest-keyed groupBy (the q90 shuffle) with the
    period split as two conditional partial sums riding the same
    aggregate — no second scan, no join of two per-period aggregates. At
    10^12 rows the shuffle is bounded by distinct templates per task,
    never lines (a surge of 10^6 identical lines ships one partial row).
    """
    split = F.lit(split_ts).cast("timestamp")
    tmpl = F.regexp_replace(
        F.regexp_replace(F.col(text_col), "[0-9a-fA-F]{8,}", "<HEX>"), "[0-9]+", "<N>"
    )
    ts = F.col(ts_col)
    d = df.select(*keys, ts.alias("_ts"), tmpl.alias("template"))
    grouped = d.groupBy(*keys, F.md5("template").alias("template_fp")).agg(
        F.min("template").alias("template"),
        _bigint(F.sum(F.when(F.col("_ts") < split, 1).otherwise(0))).alias("n_prev"),
        _bigint(F.sum(F.when(F.col("_ts") >= split, 1).otherwise(0))).alias("n_cur"),
    )
    return grouped.select(
        *keys,
        "template",
        "template_fp",
        "n_prev",
        "n_cur",
        F.expr("1000000 * n_cur div greatest(n_prev, 1L)").cast("bigint").alias("lift_ppm"),
        (F.col("n_prev") == 0).alias("is_new"),
    )


def sliding_window_counts(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    range_seconds: int = 3600,
    burst_threshold: int | None = None,
) -> DataFrame:
    """Trailing event-time RANGE window per key: at every event, the count
    of that key's events in the preceding ``range_seconds`` (inclusive of
    the current instant) — the burst/velocity signal behind adaptive rate
    limiting, complementing :func:`rate_limit`'s fixed-bucket quota (a
    burst straddling a bucket boundary is invisible to buckets; the RANGE
    frame sees it).

    This is a true value-RANGE frame over integer micros, not a ROWS
    frame: all events at the exact same timestamp are frame peers and
    count together in BOTH engines (SQL RANGE semantics), so ties need no
    tiebreak to be deterministic. One hashpartitioning(keys) exchange +
    one in-task sort; rows with NULL ts are refused per-row.

    With ``burst_threshold`` an int flag column ``burst`` marks counts at
    or above it.
    """
    if range_seconds <= 0:
        raise ValueError(f"range_seconds must be positive, got {range_seconds}")
    ts_us = F.unix_micros(F.to_utc_timestamp(F.col(ts_col), "UTC"))
    out = df.filter(F.col(ts_col).isNotNull()).withColumn("ts_us", ts_us)
    w = (
        Window.partitionBy(*keys)
        .orderBy("ts_us")
        .rangeBetween(-int(range_seconds) * 1_000_000, 0)
    )
    out = out.withColumn("n_trailing", F.count(F.lit(1)).over(w).cast("bigint"))
    if burst_threshold is not None:
        out = out.withColumn(
            "burst", (F.col("n_trailing") >= F.lit(int(burst_threshold))).cast("int")
        )
    return out
