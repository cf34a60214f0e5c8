"""Hostmetrics scraper receiver (pull-loop analog).

Reference: ``receiver/hostmetricsreceiver`` — a scraper controller ticks every
``collection_interval`` (``receiver/scraperhelper/scrapercontroller.go:39-60``,
default 1 min) and each scraper appends datapoints with OTel metric names and
labels (``internal/scraper/cpuscraper/cpu_scraper_linux.go:29-36`` — per-cpu
``system.cpu.time`` by state; ``memoryscraper``, ``loadscraper``,
``networkscraper``, ``pagingscraper``, ``filesystemscraper`` likewise).

Spark analog: scraping is imperative host I/O, so the *parsers* are pure
functions over ``/proc`` text (unit-testable on fixtures, like the Go
scrapers' mocked gopsutil), and distribution comes from WHERE they run:

- :func:`scrape_host` — driver-side snapshot -> small DataFrame (the
  single-host receiver, exactly the reference's scope).
- :func:`scrape_cluster` — one scrape task per executor slot via
  ``mapPartitions`` (per-partition imperative logic — the one legitimate RDD
  use), so a 1000-executor cluster self-reports hostmetrics as a DataFrame
  with a ``host`` label. This is the Spark-first version of "run a collector
  on every node".

Datapoint shape (pdata NumberDataPoint analog):
``(scraper, metric, labels map<string,string>, value double)`` + scrape ts.
"""

from __future__ import annotations

import os
import socket
import time
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

POINT_SCHEMA = (
    "ts double, host string, scraper string, metric string, "
    "labels map<string,string>, value double"
)

# /proc/stat field order -> LabelCPUState (cpu_scraper_linux.go:29-36)
_CPU_STATES = ["user", "nice", "system", "idle", "wait", "interrupt", "softirq", "steal"]
_CPU_STATE_ORDER = {  # /proc/stat column index (after the cpu label) per state
    "user": 0, "nice": 1, "system": 2, "idle": 3, "wait": 4,
    "interrupt": 5, "softirq": 6, "steal": 7,
}


def parse_proc_stat(text: str, clk_tck: float = 100.0) -> list[tuple[str, str, dict, float]]:
    """``/proc/stat`` -> per-cpu ``system.cpu.time`` seconds by state."""
    points = []
    for line in text.splitlines():
        parts = line.split()
        if not parts or not parts[0].startswith("cpu") or parts[0] == "cpu":
            continue  # skip the aggregate line like the per-cpu Go path
        jiffies = [float(x) for x in parts[1:9]]
        for state in _CPU_STATES:
            idx = _CPU_STATE_ORDER[state]
            if idx < len(jiffies):
                points.append(
                    ("cpu", "system.cpu.time",
                     {"cpu": parts[0], "state": state}, jiffies[idx] / clk_tck)
                )
    return points


def parse_meminfo(text: str) -> list[tuple[str, str, dict, float]]:
    """``/proc/meminfo`` -> ``system.memory.usage`` bytes by state
    (gopsutil convention: used = total - free - buffered - cached)."""
    kv = {}
    for line in text.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            kv[k.strip()] = float(v.strip().split()[0]) * 1024  # kB -> bytes
    free = kv.get("MemFree", 0.0)
    buffered = kv.get("Buffers", 0.0)
    cached = kv.get("Cached", 0.0)
    used = kv.get("MemTotal", 0.0) - free - buffered - cached
    out = []
    for state, val in (
        ("used", used), ("free", free), ("buffered", buffered), ("cached", cached),
        ("slab_reclaimable", kv.get("SReclaimable", 0.0)),
        ("slab_unreclaimable", kv.get("SUnreclaim", 0.0)),
    ):
        out.append(("memory", "system.memory.usage", {"state": state}, val))
    return out


def parse_loadavg(text: str) -> list[tuple[str, str, dict, float]]:
    """``/proc/loadavg`` -> system.cpu.load_average.{1m,5m,15m}."""
    one, five, fifteen = (float(x) for x in text.split()[:3])
    return [
        ("load", "system.cpu.load_average.1m", {}, one),
        ("load", "system.cpu.load_average.5m", {}, five),
        ("load", "system.cpu.load_average.15m", {}, fifteen),
    ]


def parse_net_dev(text: str) -> list[tuple[str, str, dict, float]]:
    """``/proc/net/dev`` -> system.network.{io,packets,errors,dropped}
    by device + direction (networkscraper metadata)."""
    points = []
    for line in text.splitlines()[2:]:  # two header lines
        if ":" not in line:
            continue
        dev, rest = line.split(":", 1)
        f = [float(x) for x in rest.split()]
        if len(f) < 12:
            continue
        labels_r = {"device": dev.strip(), "direction": "receive"}
        labels_t = {"device": dev.strip(), "direction": "transmit"}
        points += [
            ("network", "system.network.io", labels_r, f[0]),
            ("network", "system.network.packets", labels_r, f[1]),
            ("network", "system.network.errors", labels_r, f[2]),
            ("network", "system.network.dropped", labels_r, f[3]),
            ("network", "system.network.io", labels_t, f[8]),
            ("network", "system.network.packets", labels_t, f[9]),
            ("network", "system.network.errors", labels_t, f[10]),
            ("network", "system.network.dropped", labels_t, f[11]),
        ]
    return points


def parse_vmstat(text: str) -> list[tuple[str, str, dict, float]]:
    """``/proc/vmstat`` -> paging operations + faults (pagingscraper)."""
    kv = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) == 2:
            kv[parts[0]] = float(parts[1])
    out = []
    for key, direction in (("pswpin", "page_in"), ("pswpout", "page_out")):
        if key in kv:
            out.append(("paging", "system.paging.operations",
                        {"direction": direction, "type": "major"}, kv[key]))
    if "pgmajfault" in kv:
        out.append(("paging", "system.paging.faults", {"type": "major"}, kv["pgmajfault"]))
        if "pgfault" in kv:
            out.append(("paging", "system.paging.faults", {"type": "minor"},
                        kv["pgfault"] - kv["pgmajfault"]))
    return out


def scrape_filesystem(mount: str = "/") -> list[tuple[str, str, dict, float]]:
    """statvfs -> system.filesystem.usage / inodes.usage by state."""
    st = os.statvfs(mount)
    free_b = float(st.f_bfree * st.f_frsize)
    used_b = float((st.f_blocks - st.f_bfree) * st.f_frsize)
    labels = {"mountpoint": mount}
    return [
        ("filesystem", "system.filesystem.usage", {**labels, "state": "used"}, used_b),
        ("filesystem", "system.filesystem.usage", {**labels, "state": "free"}, free_b),
        ("filesystem", "system.filesystem.inodes.usage",
         {**labels, "state": "used"}, float(st.f_files - st.f_ffree)),
        ("filesystem", "system.filesystem.inodes.usage",
         {**labels, "state": "free"}, float(st.f_ffree)),
    ]


_PROC_PARSERS = {
    "cpu": ("/proc/stat", parse_proc_stat),
    "memory": ("/proc/meminfo", parse_meminfo),
    "load": ("/proc/loadavg", parse_loadavg),
    "network": ("/proc/net/dev", parse_net_dev),
    "paging": ("/proc/vmstat", parse_vmstat),
}

DEFAULT_SCRAPERS = ("cpu", "memory", "load", "network", "paging", "filesystem")


def scrape_once(scrapers: Iterable[str] = DEFAULT_SCRAPERS) -> list[tuple]:
    """One host snapshot -> rows matching POINT_SCHEMA."""
    ts = time.time()
    host = socket.gethostname()
    rows: list[tuple] = []
    for name in scrapers:
        if name == "filesystem":
            pts = scrape_filesystem()
        else:
            path, parser = _PROC_PARSERS[name]
            try:
                with open(path) as f:
                    pts = parser(f.read())
            except OSError:  # non-linux host: scraper yields nothing
                pts = []
        rows += [(ts, host, s, m, labels, v) for (s, m, labels, v) in pts]
    return rows


def scrape_host(
    spark: SparkSession,
    scrapers: Iterable[str] = DEFAULT_SCRAPERS,
    collection_interval: float = 0.0,
    n_collections: int = 1,
) -> DataFrame:
    """Driver-side scrape controller: ``n_collections`` snapshots spaced by
    ``collection_interval`` seconds (scrapercontroller.go tick loop, bounded
    for batch)."""
    rows: list[tuple] = []
    for i in range(n_collections):
        if i:
            time.sleep(collection_interval)
        rows += scrape_once(scrapers)
    return spark.createDataFrame(rows, POINT_SCHEMA)


def scrape_cluster(
    spark: SparkSession,
    parallelism: int | None = None,
    scrapers: Iterable[str] = DEFAULT_SCRAPERS,
) -> DataFrame:
    """One scrape task per executor slot; duplicate hosts deduped to one
    snapshot per (host, scraper). On a real cluster each executor node
    reports once — the per-node collector DaemonSet pattern, expressed as a
    Spark job."""
    n = parallelism or spark.sparkContext.defaultParallelism
    scraper_list = tuple(scrapers)

    def _scrape_partition(_it):
        return iter(scrape_once(scraper_list))

    rdd = spark.sparkContext.parallelize(range(n), n).mapPartitions(_scrape_partition)
    df = spark.createDataFrame(rdd, POINT_SCHEMA)
    # local mode: every slot sees the same host — keep the first snapshot
    # per (host, scraper, metric, labels); on a cluster hosts differ.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("host", "scraper", "metric", F.to_json("labels")).orderBy("ts")
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
