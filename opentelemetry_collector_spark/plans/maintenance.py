"""Sink maintenance: small-file compaction and partition retention.

The streaming fan-out (streaming/stream.py run_stream_pipeline) appends one
partition per epoch; a long-running ingest accumulates thousands of tiny
parquet files, and scan cost at 100 TB is dominated by file-open overhead
long before bytes. The reference collector never faces this (its file
exporter appends to ONE file forever, exporter/fileexporter/file_exporter.go:
30-80); table maintenance is the cost the at-rest representation introduces,
so it ships as a first-class operator here.

Design constraints (the same contract as the epoch writer):

- **per-partition idempotence** — compaction rewrites a partition with
  dynamic partition overwrite, the exact mechanism the epoch writer already
  relies on for replay safety: a crashed/repeated compaction converges;
- **touch only fragmented partitions** — partitions at or under the file
  budget are not rewritten (their files, and hence any downstream
  mtime/etag-based caches, stay byte-identical);
- **partition-pruned read** — the rewrite job reads ONLY the fragmented
  partitions (IN-list filter on the partition column -> static pruning), so
  compaction cost scales with fragmentation, not table size.

On an object store / Iceberg sink the same operator is metadata-native
(`rewrite_data_files` + `expire_snapshots`); the filesystem walk below is
the local-parquet binding of the identical policy.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class PartitionStat:
    value: str  # raw partition value (directory suffix, unescaped)
    n_files: int
    bytes: int


def _list_partitions(path: str, partition_col: str) -> list[PartitionStat]:
    out: list[PartitionStat] = []
    prefix = f"{partition_col}="
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if not (name.startswith(prefix) and os.path.isdir(full)):
            continue
        files = [
            f for f in os.listdir(full)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        size = sum(os.path.getsize(os.path.join(full, f)) for f in files)
        out.append(PartitionStat(name[len(prefix):], len(files), size))
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    max_files_per_partition: int = 1,
    max_records_per_file: int | None = None,
) -> dict[str, int]:
    """Rewrite every partition holding more than ``max_files_per_partition``
    files; returns ``{partitions_compacted, files_before, files_after}``.

    Idempotent and safe to repeat: a second run finds nothing fragmented.
    """
    stats = _list_partitions(path, partition_col)
    fragmented = [s for s in stats if s.n_files > max_files_per_partition]
    if not fragmented:
        return {"partitions_compacted": 0, "files_before": 0, "files_after": 0}

    values = [s.value for s in fragmented]
    df = spark.read.parquet(path)
    # the partition column comes back typed from directory inference — cast
    # the IN-list probe to string so raw directory values compare cleanly
    sel = df.filter(F.col(partition_col).cast("string").isin(values))
    writer = (
        sel.repartition(len(values), F.col(partition_col))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(partition_col).parquet(path)

    after = {s.value: s for s in _list_partitions(path, partition_col)}
    return {
        "partitions_compacted": len(values),
        "files_before": sum(s.n_files for s in fragmented),
        "files_after": sum(after[v].n_files for v in values if v in after),
    }


def expire_partitions(
    path: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """Drop partitions whose (string-ordered) value sorts BELOW ``keep_from``
    — epoch/date retention for append-forever streaming sinks. Returns the
    dropped partition values. Metadata-only on Iceberg (expire_snapshots /
    DROP PARTITION); a directory delete on the local binding.

    String ordering matches value ordering for zero-padded epochs and
    ISO dates; pad numeric epochs at write time or pass a padded cutoff.
    """
    dropped: list[str] = []
    for s in _list_partitions(path, partition_col):
        if s.value < keep_from:
            shutil.rmtree(os.path.join(path, f"{partition_col}={s.value}"))
            dropped.append(s.value)
    return dropped


def purge_keys(
    spark: SparkSession,
    path: str,
    partition_col: str,
    key_col: str,
    keys,
) -> dict[str, int]:
    """Targeted row deletion (the right-to-be-forgotten / retention-by-key
    op every at-rest corpus eventually needs; the reference never stores
    data, so this is purely the cost of our sink tables): remove every row
    whose ``key_col`` is in ``keys``, rewriting ONLY the partitions that
    contain a hit.

    ``keys`` is a list of values or a single-column DataFrame.

    Mechanism, in the order that makes a crash harmless:

    1. **locate** — one column-pruned scan of (partition, key) joined
       against the key set (broadcast when small; AQE decides) yields the
       per-partition hit and survivor counts. Partitions with no hits are
       never read again and their files stay byte-identical.
    2. **rewrite** — partitions with hits AND survivors are rewritten with
       an anti-join filter under dynamic partition overwrite (the
       compaction op's idempotence mechanism: a repeated rewrite
       converges).
    3. **drop** — partitions whose every row is purged are removed whole;
       dynamic overwrite cannot express "this partition is now empty"
       (writing zero rows for a value touches nothing), so the empty case
       is a directory-level delete, last, after the rewrites committed.

    On Iceberg the same policy is `DELETE WHERE` + `expire_snapshots`;
    this is the local-parquet binding. Returns counts for audit:
    ``rows_purged`` must be reconciled against the request upstream (a key
    with zero hits is NOT an error — deletion requests repeat).
    """
    from pyspark.sql import DataFrame

    if isinstance(keys, DataFrame):
        kdf = keys.toDF("_purge_key").distinct()
    else:
        if not keys:
            return {
                "partitions_rewritten": 0,
                "partitions_dropped": 0,
                "rows_purged": 0,
                "rows_remaining": -1,
            }
        kdf = spark.createDataFrame([(k,) for k in keys], ["_purge_key"]).distinct()

    df = spark.read.parquet(path)
    probe = df.select(
        F.col(partition_col).cast("string").alias("_pv"), F.col(key_col)
    ).join(kdf, F.col(key_col) == F.col("_purge_key"), "left")
    per_part = (
        probe.groupBy("_pv")
        .agg(
            F.sum(F.col("_purge_key").isNotNull().cast("bigint")).alias("_hits"),
            F.sum(F.col("_purge_key").isNull().cast("bigint")).alias("_survivors"),
        )
        .filter(F.col("_hits") > 0)
        .collect()
    )
    rewrite = [r["_pv"] for r in per_part if r["_survivors"] > 0]
    drop = [r["_pv"] for r in per_part if r["_survivors"] == 0]
    purged = sum(r["_hits"] for r in per_part)

    if rewrite:
        sel = df.filter(F.col(partition_col).cast("string").isin(rewrite))
        survivors = sel.join(
            kdf, sel[key_col] == kdf["_purge_key"], "left_anti"
        )
        (
            survivors.repartition(len(rewrite), F.col(partition_col))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    for v in drop:
        target = os.path.join(path, f"{partition_col}={v}")
        if os.path.isdir(target):
            shutil.rmtree(target)

    if not (rewrite or drop):
        remaining = -1
    elif not _list_partitions(path, partition_col):
        remaining = 0  # every partition purged whole; nothing left to scan
    else:
        remaining = spark.read.parquet(path).count()
    return {
        "partitions_rewritten": len(rewrite),
        "partitions_dropped": len(drop),
        "rows_purged": int(purged),
        "rows_remaining": int(remaining),
    }


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates,
    partition_col: str,
    key_cols: list[str],
    ts_col: str,
    tombstone_col: str | None = None,
) -> dict[str, int]:
    """CDC MERGE: apply a keyed change batch to a partitioned sink with
    LATEST-WINS semantics (Iceberg's ``MERGE INTO`` / the upsert every
    change-capture pipeline needs; this is the local-parquet binding on
    the same dynamic-partition-overwrite idempotence contract as
    :func:`compact_partitions`).

    Semantics per key (within its partition):

    - newest ``ts_col`` wins; on an exact ts tie the UPDATE wins over the
      existing row (change batches are authoritative);
    - a winning row with ``tombstone_col`` true DELETES the key;
    - keys absent from the batch are untouched — as are whole partitions
      the batch never mentions (their files stay byte-identical).

    Requires a stable key→partition mapping (the standard CDC constraint:
    a key that moved partitions would leave its old row behind — derive
    ``partition_col`` from the key upstream if keys can move).

    Scale shape: the rewrite reads ONLY the touched partitions (IN-list →
    static pruning), the dedup is one window per (partition, key), and a
    crashed/repeated merge converges because the same winners win again.
    Idempotent: re-applying the identical batch is a no-op by value.
    """
    from pyspark.sql import Window

    touched = [
        str(r["_pv"])
        for r in updates.select(
            F.col(partition_col).cast("string").alias("_pv")
        ).distinct().collect()
    ]
    if not touched:
        return {"partitions_rewritten": 0, "rows_in_batch": 0, "rows_after": 0}

    n_updates = updates.count()
    upd = updates.withColumn("_src", F.lit(1))
    if tombstone_col is None:
        upd = upd.withColumn("_dead", F.lit(False))
    else:
        upd = upd.withColumn(
            "_dead", F.coalesce(F.col(tombstone_col).cast("boolean"), F.lit(False))
        ).drop(tombstone_col)

    if os.path.isdir(path) and _list_partitions(path, partition_col):
        existing = (
            spark.read.parquet(path)
            .filter(F.col(partition_col).cast("string").isin(touched))
            .withColumn("_src", F.lit(0))
            .withColumn("_dead", F.lit(False))
        )
        merged = existing.unionByName(upd)
    else:
        merged = upd

    w = Window.partitionBy(
        partition_col, *key_cols
    ).orderBy(F.col(ts_col).desc(), F.col("_src").desc())
    winners = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & ~F.col("_dead"))
        .drop("_rn", "_src", "_dead")
    )
    # dynamic overwrite can't express "this partition is now empty" (zero
    # rows for a value touches nothing — see purge_keys): find all-tombstone
    # partitions first, rewrite the rest, directory-delete the empty ones
    # LAST so a crash between the two steps leaves only un-deleted data.
    alive = {
        str(r["_pv"])
        for r in winners.select(
            F.col(partition_col).cast("string").alias("_pv")
        ).distinct().collect()
    }
    emptied = [v for v in touched if v not in alive]
    if alive:
        (
            winners.repartition(max(len(alive), 1), F.col(partition_col))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    for v in emptied:
        target = os.path.join(path, f"{partition_col}={v}")
        if os.path.isdir(target):
            shutil.rmtree(target)
    if _list_partitions(path, partition_col):
        after = (
            spark.read.parquet(path)
            .filter(F.col(partition_col).cast("string").isin(touched))
            .count()
        )
    else:
        after = 0  # every touched partition tombstoned away; nothing to scan
    return {
        "partitions_rewritten": len(touched),
        "rows_in_batch": int(n_updates),
        "rows_after": int(after),
    }
