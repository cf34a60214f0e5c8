"""Snapshot diff: keyed added/removed/changed comparison of two tables.

The regression gate a pipeline run needs before promoting a sink rewrite
(the at-rest analog of the reference testbed's sent==received validation,
``testbed/correctness/traces/correctness_test.go:38-100``, generalized from
counts to row identity): given the previous snapshot and the new one, name
exactly which keys appeared, vanished, or changed — without ever comparing
payloads row-by-row on the driver.

Scale shape: each side reduces to (key, md5-of-compared-columns) in a
column-pruned projection, then ONE full-outer equi-join keyed on the key
columns classifies every row; AQE sizes/broadcasts it like any join. The
digest keeps the shuffle narrow no matter how wide the rows are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# field / null sentinels for the row digest: unit separator between columns,
# NUL for SQL NULL — both reproducible in DuckDB (chr(31) / chr(0)), so an
# oracle can replay the digest byte-for-byte
_SEP = "\x1f"
_NULL = "\x00"


def row_digest(cols: list[str]):
    """md5 over the named columns in the given order, NULL-safe and
    column-boundary-safe (a NULL never collides with an empty string, and
    ('ab','c') never collides with ('a','bc'))."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    return F.md5(F.concat_ws(_SEP, *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots: ``added`` (only in new),
    ``removed`` (only in old), ``changed`` (both, differing digest).
    Unchanged keys are not returned — at 100 TB the interesting set is the
    delta, and the unchanged mass should never leave the join.

    ``compare_cols`` defaults to the non-key columns present in BOTH
    frames, sorted by name (deterministic digest). Keys must be unique per
    side — duplicate keys make "changed" ill-defined; the caller dedups
    first (``exact_dedup``) or diffs at a finer key.

    Timestamps/doubles compare via their string casts; callers wanting
    tolerance-based float comparison should round/quantize into the
    compared columns first.
    """
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(keys)
        )
    if not compare_cols:
        raise ValueError("no columns to compare (keys cover every column)")
    missing = [c for c in compare_cols for side in (old, new) if c not in side.columns]
    if missing:
        raise ValueError(f"compare columns missing from a side: {sorted(set(missing))}")

    o = old.select(*keys, row_digest(compare_cols).alias("_old_digest"))
    n = new.select(*keys, row_digest(compare_cols).alias("_new_digest"))
    joined = o.join(n, keys, "full_outer")
    status = (
        F.when(F.col("_old_digest").isNull(), F.lit("added"))
        .when(F.col("_new_digest").isNull(), F.lit("removed"))
        .when(F.col("_old_digest") != F.col("_new_digest"), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*keys, "status")
    )
