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


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column. NULLs are
    not distinct values (SQL count-distinct semantics in both engines)."""
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        # coalesce: SUM over an empty table is NULL, but zero rows have
        # zero nulls
        aggs.append(
            F.coalesce(F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)).alias(
                f"_null_{i}"
            )
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"_dist_{i}"))
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
