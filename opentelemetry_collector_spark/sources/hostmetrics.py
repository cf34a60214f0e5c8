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


def _name_filter(include=None, exclude=None, match_type: str = "strict"):
    """filterset analog over device/executable names
    (``diskscraper/disk_scraper_others.go:56-70`` builds include/exclude
    filtersets; regexp match is find-anywhere like the unanchored
    ``MatchString`` at ``regexpfilterset.go:64``)."""
    import re

    if match_type == "strict":
        inc_set, exc_set = set(include or ()), set(exclude or ())
        inc = (lambda n: n in inc_set) if include else None
        exc = (lambda n: n in exc_set) if exclude else None
    else:
        inc_p = [re.compile(p) for p in (include or ())]
        exc_p = [re.compile(p) for p in (exclude or ())]
        inc = (lambda n: any(p.search(n) for p in inc_p)) if include else None
        exc = (lambda n: any(p.search(n) for p in exc_p)) if exclude else None

    def keep(name: str) -> bool:
        if inc is not None and not inc(name):
            return False
        return not (exc is not None and exc(name))

    return keep


_SECTOR_BYTES = 512.0  # gopsutil disk.IOCounters sector unit


def parse_diskstats(
    text: str, include=None, exclude=None, match_type: str = "strict"
) -> list[tuple[str, str, dict, float]]:
    """``/proc/diskstats`` -> the diskscraper's 7 metrics by device(+direction)
    (``diskscraper/disk_scraper_others.go:85-141`` io/operations/io_time/
    operation_time/pending_operations + the linux-only weighted_io_time and
    merged from ``disk_scraper_others_linux.go:28-57``; ms counters -> seconds,
    sectors -> bytes)."""
    keep = _name_filter(include, exclude, match_type)
    points = []
    for line in text.splitlines():
        f = line.split()
        if len(f) < 14:
            continue
        dev = f[2]
        if not keep(dev):
            continue
        (reads, reads_merged, sectors_read, ms_reading, writes, writes_merged,
         sectors_written, ms_writing, ios_in_progress, ms_io, ms_weighted) = (
            float(x) for x in f[3:14]
        )
        r = {"device": dev, "direction": "read"}
        w = {"device": dev, "direction": "write"}
        d = {"device": dev}
        points += [
            ("disk", "system.disk.io", r, sectors_read * _SECTOR_BYTES),
            ("disk", "system.disk.io", w, sectors_written * _SECTOR_BYTES),
            ("disk", "system.disk.operations", r, reads),
            ("disk", "system.disk.operations", w, writes),
            ("disk", "system.disk.io_time", d, ms_io / 1e3),
            ("disk", "system.disk.operation_time", r, ms_reading / 1e3),
            ("disk", "system.disk.operation_time", w, ms_writing / 1e3),
            ("disk", "system.disk.pending_operations", d, ios_in_progress),
            ("disk", "system.disk.weighted_io_time", d, ms_weighted / 1e3),
            ("disk", "system.disk.merged", r, reads_merged),
            ("disk", "system.disk.merged", w, writes_merged),
        ]
    return points


def parse_proc_stat_processes(text: str) -> list[tuple[str, str, dict, float]]:
    """``/proc/stat`` scheduler counters -> system.processes.count by status
    (running/blocked, ``processesscraper/processes_scraper_unix.go:33-44``)
    plus the linux-only system.processes.created cumulative fork count
    (``processes_scraper_linux.go:17-23``)."""
    kv = {}
    for line in text.splitlines():
        parts = line.split()
        if len(parts) == 2:
            kv[parts[0]] = float(parts[1])
    out = []
    if "procs_running" in kv:
        out.append(("processes", "system.processes.count",
                    {"status": "running"}, kv["procs_running"]))
    if "procs_blocked" in kv:
        out.append(("processes", "system.processes.count",
                    {"status": "blocked"}, kv["procs_blocked"]))
    if "processes" in kv:
        out.append(("processes", "system.processes.created", {}, kv["processes"]))
    return out


def parse_pid_stat(text: str, clk_tck: float = 100.0) -> dict[str, float]:
    """``/proc/<pid>/stat`` -> process.cpu.time seconds by state
    (user/system/wait, ``processscraper/process_scraper_linux.go:12-16`` —
    gopsutil maps utime/stime/delayacct_blkio_ticks). The comm field may
    contain spaces/parens, so fields are taken after the LAST ``)``."""
    fields = text[text.rindex(")") + 1:].split()
    # 1-indexed stat field n lands at fields[n-3]: utime=14, stime=15,
    # delayacct_blkio_ticks=42
    return {
        "user": float(fields[11]) / clk_tck,
        "system": float(fields[12]) / clk_tck,
        "wait": (float(fields[39]) / clk_tck) if len(fields) > 39 else 0.0,
    }


def parse_pid_statm(text: str, page_size: float = 4096.0) -> dict[str, float]:
    """``/proc/<pid>/statm`` (pages) -> rss/vms bytes — gopsutil MemoryInfo,
    feeding process.memory.{physical,virtual}_usage
    (``process_scraper.go:177-185``)."""
    f = text.split()
    return {"vms": float(f[0]) * page_size, "rss": float(f[1]) * page_size}


def parse_pid_io(text: str) -> dict[str, float]:
    """``/proc/<pid>/io`` -> storage-layer read/write bytes for
    process.disk.io (``process_scraper.go:198-212``)."""
    kv = {}
    for line in text.splitlines():
        if ":" in line:
            k, v = line.split(":", 1)
            kv[k.strip()] = float(v.strip())
    return {"read": kv.get("read_bytes", 0.0), "write": kv.get("write_bytes", 0.0)}


def scrape_processes(
    proc_root: str = "/proc",
    include=None,
    exclude=None,
    match_type: str = "strict",
    clk_tck: float | None = None,
    page_size: float | None = None,
) -> list[tuple[str, str, dict, float]]:
    """Per-process scraper (``processscraper/process_scraper.go:70-160``):
    one resource per live process — pid / executable / command / owner become
    the point's labels (the exporterhelper resource->label conversion applied
    up front, since our point schema is flat) — with process.cpu.time,
    process.memory.{physical,virtual}_usage and process.disk.io metrics.

    Reference semantics kept: executable-name include/exclude filtering
    (:126-130); a process whose executable can't be read is skipped entirely
    (:118-123, kernel threads land here); any other per-file read failure
    drops only that metric/attribute, never the scrape (``errs.AddPartial``).
    """
    import pwd

    clk = clk_tck or float(os.sysconf("SC_CLK_TCK"))
    psize = page_size or float(os.sysconf("SC_PAGE_SIZE"))
    keep = _name_filter(include, exclude, match_type)
    points: list[tuple[str, str, dict, float]] = []
    try:
        entries = os.listdir(proc_root)
    except OSError:
        return points
    for entry in entries:
        if not entry.isdigit():
            continue
        base = os.path.join(proc_root, entry)
        try:
            exe = os.readlink(os.path.join(base, "exe"))
        except OSError:
            continue  # process_scraper.go:118-123 — no executable, skip
        # name from the exe path, NOT /proc/<pid>/comm: the kernel truncates
        # comm to 15 chars, which would silently break strict filtersets on
        # longer executable names
        name = os.path.basename(exe)
        if not keep(name):
            continue
        resource = {
            "process.pid": entry,
            "process.executable.name": name,
            "process.executable.path": exe,
        }
        try:
            with open(os.path.join(base, "cmdline"), "rb") as f:
                argv = [a.decode(errors="replace") for a in f.read().split(b"\0") if a]
            if argv:  # command = argv[0], command_line = joined (process.go:41-47)
                resource["process.command"] = argv[0]
                resource["process.command_line"] = " ".join(argv)
        except OSError:
            pass
        try:
            resource["process.owner"] = pwd.getpwuid(os.stat(base).st_uid).pw_name
        except (OSError, KeyError):
            pass
        try:
            with open(os.path.join(base, "stat")) as f:
                for state, v in parse_pid_stat(f.read(), clk).items():
                    points.append(
                        ("process", "process.cpu.time", {**resource, "state": state}, v)
                    )
        except (OSError, ValueError):
            pass
        try:
            with open(os.path.join(base, "statm")) as f:
                mem = parse_pid_statm(f.read(), psize)
            points.append(
                ("process", "process.memory.physical_usage", dict(resource), mem["rss"])
            )
            points.append(
                ("process", "process.memory.virtual_usage", dict(resource), mem["vms"])
            )
        except (OSError, ValueError):
            pass
        try:
            with open(os.path.join(base, "io")) as f:
                io = parse_pid_io(f.read())
            points.append(
                ("process", "process.disk.io", {**resource, "direction": "read"}, io["read"])
            )
            points.append(
                ("process", "process.disk.io", {**resource, "direction": "write"}, io["write"])
            )
        except (OSError, ValueError):
            pass
    return points


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
    "disk": ("/proc/diskstats", parse_diskstats),
    "processes": ("/proc/stat", parse_proc_stat_processes),
}

# all 9 reference scrapers; "process" (per-pid) stays opt-in because its
# per-process resource labels are unbounded-cardinality next to these
DEFAULT_SCRAPERS = (
    "cpu", "memory", "load", "network", "paging", "filesystem", "disk", "processes",
)


def scrape_once(scrapers: Iterable[str] = DEFAULT_SCRAPERS) -> list[tuple]:
    """One host snapshot -> rows matching POINT_SCHEMA."""
    ts = time.time()
    host = socket.gethostname()
    rows: list[tuple] = []
    for name in scrapers:
        if name == "filesystem":
            pts = scrape_filesystem()
        elif name == "process":
            pts = scrape_processes()
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
