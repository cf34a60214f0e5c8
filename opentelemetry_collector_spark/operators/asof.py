"""As-of (latest-preceding-event) join — a SURVEY §2.7 gap-filler.

The reference's only enrichment primitive is a static lookup: the resource
processor / ``from_attribute`` actions read a value that never changes over
the life of a batch (``processor/resourceprocessor/resource_processor.go:29-53``,
``processor/processorhelper/attraction.go:250-257``). A transcripts pipeline
also needs the *time-varying* generalization: attach to each record the most
recent preceding record of another stream with the same key (which user turn
prompted this assistant turn; which config/deploy event was live when this
span ran).

Scale shape — the union-and-window formulation, NOT a range join:

- tag both sides, union, and take ``last(payload, ignorenulls)`` over a
  per-key window ordered by (order value, side marker);
- exactly ONE hashpartitioning(keys) exchange + sort, independent of how
  many right rows precede each left row — a range-condition join explodes
  to O(|L| x |R|) comparisons per key and Catalyst plans it as
  BroadcastNestedLoop unless one side is tiny;
- the side marker makes the equal-order tie-break explicit (strict ``<``
  sorts right rows after left rows at the same order value, so they are
  invisible to it; non-strict ``<=`` sorts them before);
- payload columns travel as ONE struct so every enriched value comes from
  the SAME right row (per-column ``last(ignorenulls)`` would mix rows when
  a right payload value is legitimately NULL);
- skew note: one hot key serializes its window task — at 100 TB shard the
  window by a coarse time bucket first (bucket boundaries carry the last
  payload forward), or bucket the table by key at write time so the sort
  is partition-local.

DuckDB's ``ASOF LEFT JOIN`` is the oracle (q51).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SRC = "_asof_src"
_PAY = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    order_col: str,
    payload_cols: Sequence[str],
    strict: bool = True,
) -> DataFrame:
    """Enrich ``left`` with the payload of the latest ``right`` row per key.

    ``right`` must contain ``keys + [order_col] + payload_cols``; payload
    names must not collide with ``left`` columns. For each left row the
    match is the right row with the greatest order value ``<`` (``strict``)
    or ``<=`` the left row's; no match -> NULL payloads (left join
    semantics). Ties *among right rows* at the same order value follow the
    window sort and are only deterministic if ``order_col`` is unique per
    key on the right side — pass a composite (e.g. a struct) otherwise.
    """
    keys = list(keys)
    payload_cols = list(payload_cols)
    left_rank, right_rank = (0, 1) if strict else (1, 0)
    pay_struct = F.struct(*[F.col(c) for c in payload_cols])
    # a right row with a NULL order value precedes nothing: ASOF semantics
    # (and the DuckDB oracle) never match it, but the window's nulls-first
    # ascending sort would otherwise hand its payload to every left row
    # before the first real right row
    r = right.filter(F.col(order_col).isNotNull()).select(
        *keys,
        F.col(order_col),
        F.lit(right_rank).alias(_SRC),
        pay_struct.alias(_PAY),
    )
    l = left.select(
        "*",
        F.lit(left_rank).alias(_SRC),
        F.lit(None).cast(r.schema[_PAY].dataType).alias(_PAY),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(order_col), F.col(_SRC))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = u.withColumn(_PAY, F.last(_PAY, ignorenulls=True).over(w))
    out = enriched.filter(F.col(_SRC) == left_rank).select(
        *left.columns, *[F.col(f"{_PAY}.{c}").alias(c) for c in payload_cols]
    )
    return out


def dimension_intervals(
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build an SCD-2 style validity-interval dimension from a change log:
    each change row becomes effective at its own timestamp and expires the
    instant the key's next change lands (half-open [valid_from, valid_to)
    semantics; the current version has NULL valid_to). The materialized
    complement of :func:`asof_join` — point lookups use the as-of join
    directly; interval analytics (`operators/rangejoin.interval_join`,
    BETWEEN predicates in downstream SQL) want the intervals at rest.

    One lead() window on ``hashpartitioning(keys)`` — the same single
    exchange discipline as the as-of join itself. Ties on ``ts`` within a
    key are ordered by ``tiebreak`` (last one wins the open interval;
    earlier ties get zero-length intervals, which BETWEEN-style probes at
    half-open semantics correctly never match).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return changes.withColumn(valid_from, F.col(ts_col)).withColumn(
        valid_to, F.lead(ts_col).over(w)
    )
