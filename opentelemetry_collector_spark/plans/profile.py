"""Table profiling: per-column null/distinct statistics in one pass.

The data-quality surface every at-rest corpus needs before routing or
training on it (the reference sees data only in flight; its analog is the
per-component obsreport counts, §2.6 — this is the columnar generalization
at rest). Exact counts only — no min/max strings, whose engine-specific
formatting would break value parity — so a DuckDB oracle replays the
profile bit-for-bit.

Scale shape: ONE pass over the table. Multiple exact count(DISTINCT col)
aggregates compile to a single Expand (each input row fans out once per
profiled column) + partial-aggregated groupBy — the input is read once, and
the fan-out factor is the column count, not the row count. For very wide
tables profile a column subset; for approximate profiles at extreme scale
swap count_distinct for approx_count_distinct at the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit: for each (name, child, child_key, parent,
    parent_key) relation, count child rows whose key has no parent —
    LEFT ANTI against the parent's distinct keys (AQE broadcasts small
    parents). NULL child keys are orphans of a different kind and are
    counted separately; SQL join semantics would silently drop them.
    Output: (relation, n_child, n_orphans, n_null_keys).
    """
    if not relations:
        raise ValueError("no relations to audit")
    outs = []
    for name, child, ckey, parent, pkey in relations:
        keys = parent.select(F.col(pkey).alias("_pk")).distinct()
        nonnull = child.filter(F.col(ckey).isNotNull())
        orphans = nonnull.join(
            keys, nonnull[ckey] == keys["_pk"], "left_anti"
        ).count()
        n_child = child.count()
        n_null = child.filter(F.col(ckey).isNull()).count()
        spark = child.sparkSession
        outs.append(
            spark.createDataFrame(
                [(name, n_child, orphans, n_null)],
                "relation string, n_child bigint, n_orphans bigint, n_null_keys bigint",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def table_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_rsd: float | None = None,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column. NULLs are
    not distinct values (SQL count-distinct semantics in both engines).

    ``approx_rsd=None`` (default, the oracle contract): EXACT distincts —
    the multi-count-distinct compiles to a single Expand over one scan
    (fan-out = column count, never row count). ``approx_rsd=0.05`` (etc.):
    the production switch at 10^12 rows — ``approx_count_distinct``
    (HyperLogLog++, deterministic for a given input) replaces the Expand
    with one ordinary partial-aggregated pass whose state is a fixed-size
    sketch per column, trading bounded relative error (the rsd argument)
    for scan-sized memory independence. Counts/nulls stay exact in both
    modes; only n_distinct is approximated."""
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("no columns to profile")
    if approx_rsd is not None and not 0 < approx_rsd < 1:
        raise ValueError(f"approx_rsd must be in (0, 1), got {approx_rsd}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        # coalesce: SUM over an empty table is NULL, but zero rows have
        # zero nulls
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)).alias(
                f"_null_{i}"
            )
        )
        if approx_rsd is None:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{i}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd=approx_rsd).alias(f"_dist_{i}")
            )
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                F.col(f"_null_{i}").cast("bigint").alias("n_nulls"),
                F.col(f"_dist_{i}").cast("bigint").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        row.select(F.explode(per_col).alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
    )


def join_size_estimate(
    left: DataFrame, right: DataFrame, keys: list[str]
) -> DataFrame:
    """EXACT equi-join output cardinality, computed WITHOUT running the
    join: ``sum over matching key tuples of n_left x n_right`` — the
    explosion guard a planner consults before paying for a join whose
    M:N key would go quadratic (the corpus-level form of the per-user cap
    `graph.covisitation_pairs` applies; Spark's own CBO estimates this
    from sampled stats — over exact counts the estimate IS the answer).

    Also reports the single worst key's contribution (``max_key_rows``) —
    the skew indicator that decides salting/AQE-skew before the join runs:
    a join can be modest in total yet still have one key owning 90% of it.

    Physical shape: one partial-aggregated groupBy per side (counts,
    bounded by distinct keys per task), an equi-join of the two COUNT
    frames (key-sized, AQE-sizable — never the fact tables), one scalar
    aggregate. Products accumulate in DECIMAL(38,0) so 10^6 x 10^6 keys
    can't overflow; the report casts to bigint at the end (a report whose
    total exceeds 2^63 rows is answer enough). NULL keys never match in an
    equi-join and are EXCLUDED from both count frames (SQL join
    semantics), but are reported per side so dropped mass is visible.

    Returns ONE row: (n_left_rows, n_right_rows, n_left_keys,
    n_right_keys, n_matching_keys, est_rows, max_key_rows,
    n_left_null_keys, n_right_null_keys).
    """
    if not keys:
        raise ValueError("at least one join key column is required")

    def prep(df: DataFrame, side: str):
        nonnull = None
        for k in keys:
            c = F.col(k).isNotNull()
            nonnull = c if nonnull is None else nonnull & c
        totals = df.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_{side}_rows"),
            F.sum(F.when(~nonnull, 1).otherwise(0)).cast("bigint").alias(f"n_{side}_null_keys"),
        )
        counts = (
            df.filter(nonnull)
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).cast("bigint").alias(f"_n_{side}"))
        )
        return totals, counts

    lt, lc = prep(left, "left")
    rt, rc = prep(right, "right")
    per_key = lc.join(rc, on=keys).select(
        F.expr("CAST(_n_left AS DECIMAL(38,0)) * _n_right").alias("_prod")
    )
    matched = per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matching_keys"),
        F.coalesce(F.sum("_prod"), F.lit(0)).cast("bigint").alias("est_rows"),
        F.coalesce(F.max("_prod"), F.lit(0)).cast("bigint").alias("max_key_rows"),
    )
    lkeys = lc.agg(F.count(F.lit(1)).cast("bigint").alias("n_left_keys"))
    rkeys = rc.agg(F.count(F.lit(1)).cast("bigint").alias("n_right_keys"))
    out = (
        lt.crossJoin(rt)
        .crossJoin(lkeys)
        .crossJoin(rkeys)
        .crossJoin(matched)
    )
    return out.select(
        "n_left_rows", "n_right_rows", "n_left_keys", "n_right_keys",
        "n_matching_keys", "est_rows", "max_key_rows",
        "n_left_null_keys", "n_right_null_keys",
    )
