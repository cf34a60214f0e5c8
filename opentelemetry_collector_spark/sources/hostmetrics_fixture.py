"""Deterministic hostmetrics fixture corpus — the driver-checkable face of
the /proc scrapers.

The hostmetrics scrapers (``sources/hostmetrics.py``, reference
``receiver/hostmetricsreceiver/internal/scraper/*``) parse live /proc text,
so their correctness surface was pytest-only ("live data — no oracle
possible"). This module pins a COMMITTED corpus: 8 synthetic hosts x 6
/proc files with host-varying counters derived from simple integer
formulas. q185 runs the REAL parsers over it inside ``mapInPandas`` (the
``scrape_cluster`` execution shape) while the DuckDB oracle
(``plans/oracle_gen.gen_q185_hostmetrics_sql``) re-parses the SAME text
with independent SQL string machinery — the same text-in, points-out
contract that made the Prometheus text parser driver-checkable (q40).

Labels flatten to a canonical ``k=v,k=v`` string (sorted by key) so the
driver's column-sorted value hash applies; values stay double with both
sides computing the identical IEEE chain (jiffies/100.0, kB*1024,
ms/1000.0, sectors*512.0).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

N_HOSTS = 8

POINT_COLS = "host string, scraper string, metric string, labels string, value double"


def _proc_stat(h: int) -> str:
    lines = [f"cpu  {1000 + h} {20 + h} {300 + h} {4000 + h} {50 + h} {6 + h} {7 + h} {8 + h} 0 0"]
    for c in range(2 + h % 3):
        lines.append(
            f"cpu{c} {500 + 17 * h + c} {10 + h} {150 + 3 * c} {2000 + 7 * h} "
            f"{25 + c} {3 + h % 2} {4 + c} {h % 5} 0 0"
        )
    lines += [
        "intr 12345 0 1",
        f"ctxt {900000 + 1111 * h}",
        f"processes {7000 + 13 * h}",
        f"procs_running {2 + h % 4}",
        f"procs_blocked {h % 3}",
    ]
    return "\n".join(lines) + "\n"


def _meminfo(h: int) -> str:
    return (
        f"MemTotal:       {16384000 + 4096 * h} kB\n"
        f"MemFree:         {4096000 - 1024 * h} kB\n"
        f"Buffers:          {512000 + 256 * h} kB\n"
        f"Cached:          {2048000 + 512 * h} kB\n"
        f"SReclaimable:     {256000 + 128 * h} kB\n"
        f"SUnreclaim:       {128000 + 64 * h} kB\n"
    )


def _loadavg(h: int) -> str:
    return f"{(50 + h) / 100} {(40 + h) / 100} {(30 + h) / 100} 2/345 6789\n"


def _net_dev(h: int) -> str:
    hdr = (
        "Inter-|   Receive                                                |  Transmit\n"
        " face |bytes    packets errs drop fifo frame compressed multicast|bytes    "
        "packets errs drop fifo colls carrier compressed\n"
    )
    rows = [
        f"    lo: {1000 + h}     {10 + h}    {h % 2}    {h % 3}    0     0          0 "
        f"        0     {3000 + h}     {30 + h}    {h % 2}    {h % 4}    0    0    0          0",
        f"  eth0: {200000 + 977 * h}     {2000 + 9 * h}    0    0    0     0          0 "
        f"        0     {400000 + 431 * h}     {4000 + 7 * h}    0    0    0    0    0          0",
    ]
    return hdr + "\n".join(rows) + "\n"


def _vmstat(h: int) -> str:
    return (
        f"pgfault {100000 + 321 * h}\n"
        f"pgmajfault {1000 + 21 * h}\n"
        f"pswpin {70 + h}\n"
        f"pswpout {90 + 2 * h}\n"
        "nr_free_pages 123456\n"
    )


def _diskstats(h: int) -> str:
    rows = [
        f"   8       0 sda {10000 + 37 * h} {100 + h} {800000 + 111 * h} {5000 + 7 * h} "
        f"{20000 + 53 * h} {200 + 2 * h} {1600000 + 222 * h} {9000 + 11 * h} "
        f"{h % 2} {14000 + 17 * h} {23000 + 19 * h}",
        f"   8       1 sda1 {1000 + 3 * h} {10} {80000 + 13 * h} {500 + h} "
        f"{2000 + 5 * h} {20} {160000 + 29 * h} {900 + h} 0 {1400 + h} {2300 + h}",
        f"   7       0 loop{h % 2} 10 0 80 1 0 0 0 0 0 1 1",
    ]
    return "\n".join(rows) + "\n"


_KINDS = {
    "proc_stat": _proc_stat,
    "meminfo": _meminfo,
    "loadavg": _loadavg,
    "net_dev": _net_dev,
    "vmstat": _vmstat,
    "diskstats": _diskstats,
}

#: diskscraper device filter exercised by q185 (regexp exclude, the
#: find-anywhere MatchString semantics of internal/processor/filterset)
DISK_EXCLUDE = ["^loop"]


def fixture_corpus() -> list[tuple[str, str, str]]:
    """(host, kind, text) rows — the committed deterministic corpus."""
    return [
        (f"host-{h:02d}", kind, render(h))
        for h in range(N_HOSTS)
        for kind, render in _KINDS.items()
    ]


def _canon_labels(labels: dict) -> str:
    return ",".join(f"{k}={v}" for k, v in sorted(labels.items()))


def parse_fixture_corpus(spark: SparkSession) -> DataFrame:
    """Run the real hostmetrics parsers over the fixture corpus as a Spark
    job (one Arrow batch per partition — the scrape_cluster shape)."""
    from opentelemetry_collector_spark.sources import hostmetrics as hm

    corpus = spark.createDataFrame(fixture_corpus(), "host string, kind string, text string")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, kind, text in zip(pdf["host"], pdf["kind"], pdf["text"]):
                if kind == "proc_stat":
                    pts = hm.parse_proc_stat(text) + hm.parse_proc_stat_processes(text)
                elif kind == "meminfo":
                    pts = hm.parse_meminfo(text)
                elif kind == "loadavg":
                    pts = hm.parse_loadavg(text)
                elif kind == "net_dev":
                    pts = hm.parse_net_dev(text)
                elif kind == "vmstat":
                    pts = hm.parse_vmstat(text)
                elif kind == "diskstats":
                    pts = hm.parse_diskstats(text, exclude=DISK_EXCLUDE, match_type="regexp")
                else:  # pragma: no cover - fixture kinds are closed
                    pts = []
                rows += [
                    (host, scraper, metric, _canon_labels(labels), value)
                    for scraper, metric, labels, value in pts
                ]
            yield pd.DataFrame(rows, columns=["host", "scraper", "metric", "labels", "value"])

    # 4 partitions: the corpus is 48 rows — enough fan to prove the
    # distributed shape without forking 8 python workers for it
    return corpus.repartition(4, "host").mapInPandas(_parse, POINT_COLS)
