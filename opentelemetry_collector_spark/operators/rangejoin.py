"""Bucketed interval (range) join.

The reference has no join surface at all (SURVEY §2.7) — but its
*windowing* ideas (batch timeout windows, metric staleness windows,
queued_retry outage windows) become real range predicates the moment the
data is at rest: "which turns fall inside this incident window", "which
datapoints belong to this maintenance window". Spark's own planner turns a
bare ``ts BETWEEN start AND end`` join into BroadcastNestedLoopJoin —
O(|events| x |windows|) comparisons, the classic range-join trap.

The scale path here is time binning: quantize the axis into ``bin_seconds``
buckets, explode each window into the bins it covers (``sequence`` — one
Generate, window-side only, typically the small side), equi-join on the bin
(+ any extra key), then apply the exact range predicate as a post-filter.
The join becomes a plain hash/sort-merge equi-join Catalyst and AQE know
how to shuffle, skew-handle, and broadcast; each event carries exactly ONE
bin, so a (event, window) pair can match in at most one bin — no dedup pass
is needed and the result is exactly the inequality join's.

Bin sizing is the usual histogram trade: bins >> window length explode few
rows but admit more false candidates for the post-filter; bins << window
length multiply the window-side Generate. A bin near the median window
length keeps both linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_BINS_PER_WINDOW = 1 << 16


def _bin_of(ts: Column, bin_seconds: int) -> Column:
    # unix_micros rejects TIMESTAMP_NTZ; route through the session-UTC zone
    us = F.unix_micros(F.to_utc_timestamp(ts, "UTC"))
    return F.floor(us / F.lit(int(bin_seconds) * 1_000_000)).cast("bigint")


def interval_join(
    events: DataFrame,
    windows: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join each event row to every window row whose
    ``[start_col, end_col]`` (closed interval) contains ``ts_col``,
    optionally also matching on ``extra_keys`` equality. Exactly the rows
    of the naive inequality join (asserted in test_rangejoin), as a binned
    EQUI-join plan.

    Returns events columns + windows columns (callers project). NULL
    timestamps/bounds never match; inverted windows (start > end) match
    nothing, exactly like the inequality join. A window wider than
    ``bin_seconds * 65536`` raises — that is a mis-sized bin, not a use
    case, and silently dropping it would silently drop matches. The check
    is one eager aggregate over the window side (the small side by
    construction). (An outer variant needs a unique event key to fold
    unmatched candidates without collapsing duplicate event rows — compose
    one from this inner join + LEFT ANTI when needed.)
    """
    extra_keys = list(extra_keys or [])
    dup = set(events.columns) & set(windows.columns) - set(extra_keys)
    if dup:
        raise ValueError(f"ambiguous columns (alias before joining): {sorted(dup)}")
    bin_col = "__itv_bin"
    for side, cols in (("events", events.columns), ("windows", windows.columns)):
        if bin_col in cols:
            raise ValueError(f"{side} side already has reserved column {bin_col!r}")

    sb = _bin_of(F.col(start_col), bin_seconds)
    eb = _bin_of(F.col(end_col), bin_seconds)
    oversized = windows.filter(eb - sb >= _MAX_BINS_PER_WINDOW).limit(1).count()
    if oversized:
        raise ValueError(
            f"window wider than bin_seconds*{_MAX_BINS_PER_WINDOW} "
            f"({bin_seconds=}) — pick a larger bin"
        )

    e = events.withColumn(bin_col, _bin_of(F.col(ts_col), bin_seconds))
    w = (
        windows.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .filter(eb - sb >= 0)
        .withColumn(bin_col, F.explode(F.sequence(sb, eb)))
    )
    in_range = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    return e.join(w, [bin_col, *extra_keys], "inner").filter(in_range).drop(bin_col)
