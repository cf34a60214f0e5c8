"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the same config block is what we would ship
to a real cluster via ``spark-submit --py-files`` (AQE + skew join on, shuffle
partitions sized explicitly, Arrow enabled for pandas UDF exchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "otelcol-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Under spark-submit (PythonRunner exports PYSPARK_GATEWAY_PORT into the
    # driver process) the master and any --conf arrive via the JVM-side
    # properties; forcing local[N] or our local defaults here would silently
    # override the cluster submit line. In that case set NOTHING the submit
    # line owns — master, shuffle partitions, driver memory — and only layer
    # semantics configs (UTC, Arrow) that correctness depends on.
    under_submit = master is None and os.environ.get("PYSPARK_GATEWAY_PORT") is not None
    builder = SparkSession.builder.appName(app_name)
    if not under_submit:
        master = master or f"local[{cpus}]"
        if shuffle_partitions is None:
            # local[N] → N-ish shuffle partitions; a cluster job would size
            # this to 2-3x total cores (submit --conf) and rely on AQE.
            n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
            shuffle_partitions = int(n) if n.isdigit() else cpus
        builder = (
            builder.master(master)
            .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        )
    elif shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # managed-table default location (bucketed sinks are external tables;
        # this only keeps the empty warehouse dir out of the repo checkout)
        .config("spark.sql.warehouse.dir", "/tmp/otelcol-spark-warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _parse_bytes(v: str, default: int = 128 << 20) -> int:
    """Parse a Spark byte-size conf value ('134217728', '128m', '64MB',
    '1g') the way the JVM's JavaUtils.byteStringAsBytes does — bare numbers
    are bytes; k/m/g/t/p suffixes (optionally followed by 'b'), case-
    insensitive. Unparseable values fall back to ``default``."""
    s = v.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in "kmgtp":
        mult = 1 << (10 * ("kmgtp".index(s[-1]) + 1))
        s = s[:-1]
    try:
        return int(s) * mult
    except ValueError:
        return default


def spread(df, target: int | None = None):
    """Raise a DataFrame's partition count to cluster parallelism before a
    CPU-heavy per-row stage (shingling, minhash/simhash kernels, Arrow
    UDFs).

    A small or single-file parquet scan yields one split, which serializes
    the whole kernel on one core (measured 8.1 s -> 1.7 s on the sf0.1
    simhash stage at local[32]). At real scale the scan already provides
    thousands of splits, so this is a strict no-op there — the repartition
    shuffle is only paid exactly when the input is too narrow to occupy
    the cluster.
    """
    if df.isStreaming:  # micro-batch sizing is the trigger's job
        return df
    sc = df.sparkSession.sparkContext
    tgt = target or sc.defaultParallelism
    # Estimate the scan's split count WITHOUT df.rdd (which re-translates
    # the analyzed plan to an RDD on every call): local file scans derive
    # splits from file count + size/maxPartitionBytes, exactly Spark's own
    # split math. Non-file plans (local relations, post-shuffle frames)
    # and remote filesystems fall back to the RDD probe — correctness
    # first; at real scale those scans are already thousands of splits.
    files = df.inputFiles()
    if files and all(f.startswith("file:") for f in files):
        import os as _os
        from urllib.parse import unquote, urlparse

        max_bytes = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        )
        try:
            total = sum(_os.path.getsize(unquote(urlparse(f).path)) for f in files)
        except OSError:
            total = 0
        splits = max(len(files), -(-total // max_bytes))
        if splits >= tgt:
            return df
        return df.repartition(tgt)
    if df.rdd.getNumPartitions() >= tgt:
        return df
    return df.repartition(tgt)
