"""Hostmetrics scraper tests — fixture-text parser goldens (the Go scrapers
test against mocked gopsutil the same way: cpu_scraper_test.go,
memory_scraper_test.go) plus live-scrape shape checks."""

from __future__ import annotations

import os

from opentelemetry_collector_spark.sources.hostmetrics import (
    DEFAULT_SCRAPERS,
    parse_diskstats,
    parse_loadavg,
    parse_meminfo,
    parse_net_dev,
    parse_pid_io,
    parse_pid_stat,
    parse_pid_statm,
    parse_proc_stat,
    parse_proc_stat_processes,
    parse_vmstat,
    scrape_cluster,
    scrape_host,
    scrape_once,
    scrape_processes,
)

PROC_STAT = """\
cpu  1000 20 300 4000 50 6 7 8 0 0
cpu0 500 10 150 2000 25 3 4 4 0 0
cpu1 500 10 150 2000 25 3 3 4 0 0
intr 12345
"""

MEMINFO = """\
MemTotal:       16384000 kB
MemFree:         4096000 kB
Buffers:          512000 kB
Cached:          2048000 kB
SReclaimable:     256000 kB
SUnreclaim:       128000 kB
"""

NET_DEV = """\
Inter-|   Receive                                                |  Transmit
 face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed
    lo: 1000     10    1    2    0     0          0         0     3000     30    3    4    0    0    0          0
  eth0: 2000     20    0    0    0     0          0         0     4000     40    0    0    0    0    0          0
"""

VMSTAT = """\
pgfault 1000
pgmajfault 100
pswpin 7
pswpout 9
"""


def test_cpu_parse_per_cpu_states():
    pts = parse_proc_stat(PROC_STAT, clk_tck=100.0)
    # aggregate 'cpu' line skipped; 2 cpus x 8 states
    assert len(pts) == 16
    d = {(p[2]["cpu"], p[2]["state"]): p[3] for p in pts}
    assert d[("cpu0", "user")] == 5.0  # 500 jiffies / 100 Hz
    assert d[("cpu1", "idle")] == 20.0
    assert d[("cpu0", "wait")] == 0.25
    assert all(p[1] == "system.cpu.time" for p in pts)


def test_meminfo_used_is_total_minus_free_buffered_cached():
    d = {p[2]["state"]: p[3] for p in parse_meminfo(MEMINFO)}
    assert d["free"] == 4096000 * 1024
    assert d["used"] == (16384000 - 4096000 - 512000 - 2048000) * 1024
    assert d["slab_reclaimable"] == 256000 * 1024


def test_loadavg():
    pts = parse_loadavg("1.50 0.75 0.25 2/345 6789\n")
    assert {p[1]: p[3] for p in pts} == {
        "system.cpu.load_average.1m": 1.5,
        "system.cpu.load_average.5m": 0.75,
        "system.cpu.load_average.15m": 0.25,
    }


def test_net_dev_directions():
    pts = parse_net_dev(NET_DEV)
    d = {(p[2]["device"], p[2]["direction"], p[1]): p[3] for p in pts}
    assert d[("lo", "receive", "system.network.io")] == 1000
    assert d[("lo", "transmit", "system.network.io")] == 3000
    assert d[("eth0", "transmit", "system.network.packets")] == 40
    assert d[("lo", "receive", "system.network.errors")] == 1


def test_vmstat_faults_split_major_minor():
    d = {(p[1], tuple(sorted(p[2].items()))): p[3] for p in parse_vmstat(VMSTAT)}
    assert d[("system.paging.faults", (("type", "major"),))] == 100
    assert d[("system.paging.faults", (("type", "minor"),))] == 900
    assert d[("system.paging.operations", (("direction", "page_in"), ("type", "major")))] == 7


DISKSTATS = """\
   8       0 sda 100 4 2048 500 200 8 4096 900 3 1500 1400
   8       1 sda1 10 0 64 5 20 0 128 9 0 15 14
   7       0 loop0 1 0 8 1 0 0 0 0 0 1 1
"""

PID_STAT = (
    "1234 (tmux: server) S 1 1234 1234 0 -1 4194304 100 0 0 0 "
    "250 150 0 0 20 0 1 0 12345 1000000 500 18446744073709551615 "
    "1 1 0 0 0 0 0 0 0 0 0 0 17 3 0 0 75 0 0"
)


def test_diskstats_golden_all_seven_metrics():
    pts = parse_diskstats(DISKSTATS)
    d = {(p[2]["device"], p[1], p[2].get("direction", "")): p[3] for p in pts}
    # 3 devices x 11 points
    assert len(pts) == 33
    assert d[("sda", "system.disk.io", "read")] == 2048 * 512
    assert d[("sda", "system.disk.io", "write")] == 4096 * 512
    assert d[("sda", "system.disk.operations", "read")] == 100
    assert d[("sda", "system.disk.operations", "write")] == 200
    assert d[("sda", "system.disk.io_time", "")] == 1.5  # 1500 ms
    assert d[("sda", "system.disk.operation_time", "read")] == 0.5
    assert d[("sda", "system.disk.operation_time", "write")] == 0.9
    assert d[("sda", "system.disk.pending_operations", "")] == 3
    assert d[("sda", "system.disk.weighted_io_time", "")] == 1.4
    assert d[("sda", "system.disk.merged", "read")] == 4
    assert d[("sda", "system.disk.merged", "write")] == 8


def test_diskstats_device_include_exclude_filters():
    only_sda = parse_diskstats(DISKSTATS, include=["sda"])
    assert {p[2]["device"] for p in only_sda} == {"sda"}
    no_loop = parse_diskstats(DISKSTATS, exclude=["^loop"], match_type="regexp")
    assert {p[2]["device"] for p in no_loop} == {"sda", "sda1"}
    # regexp include is find-anywhere (unanchored MatchString parity)
    sub = parse_diskstats(DISKSTATS, include=["da1"], match_type="regexp")
    assert {p[2]["device"] for p in sub} == {"sda1"}


def test_processes_counts_and_created():
    pts = parse_proc_stat_processes(
        "cpu  1 2 3 4\nprocesses 5000\nprocs_running 7\nprocs_blocked 2\n"
    )
    d = {(p[1], p[2].get("status", "")): p[3] for p in pts}
    assert d[("system.processes.count", "running")] == 7
    assert d[("system.processes.count", "blocked")] == 2
    assert d[("system.processes.created", "")] == 5000


def test_pid_stat_parses_after_last_paren_with_spacey_comm():
    t = parse_pid_stat(PID_STAT, clk_tck=100.0)
    assert t == {"user": 2.5, "system": 1.5, "wait": 0.75}


def test_pid_statm_and_io():
    mem = parse_pid_statm("1000 250 50 10 0 300 0", page_size=4096.0)
    assert mem == {"vms": 1000 * 4096.0, "rss": 250 * 4096.0}
    io = parse_pid_io("rchar: 99\nwchar: 98\nread_bytes: 7168\nwrite_bytes: 4096\n")
    assert io == {"read": 7168.0, "write": 4096.0}


def test_scrape_processes_live_finds_self():
    pts = scrape_processes()
    me = str(os.getpid())
    mine = [p for p in pts if p[2].get("process.pid") == me]
    assert mine, "per-process scrape missed the running interpreter"
    metrics = {p[1] for p in mine}
    assert "process.cpu.time" in metrics
    assert "process.memory.physical_usage" in metrics
    cpu_user = [p[3] for p in mine if p[1] == "process.cpu.time" and p[2]["state"] == "user"]
    assert cpu_user and cpu_user[0] > 0
    res = mine[0][2]
    assert res["process.executable.name"] and res["process.executable.path"]


def test_scrape_processes_name_filter_skips_self():
    pts = scrape_processes(include=["no-such-process-name"])
    assert all(p[2].get("process.pid") != str(os.getpid()) for p in pts)


def test_scrape_once_live_linux():
    rows = scrape_once()
    scrapers = {r[2] for r in rows}
    assert {"cpu", "memory", "load", "filesystem"} <= scrapers
    metrics = {r[3] for r in rows}
    assert "system.cpu.time" in metrics and "system.memory.usage" in metrics


def test_scrape_host_df_and_cumulative_cpu(spark):
    df1 = scrape_host(spark, scrapers=("cpu",))
    df2 = scrape_host(spark, scrapers=("cpu",))
    v1 = {(r.labels["cpu"], r.labels["state"]): r.value for r in df1.collect()}
    v2 = {(r.labels["cpu"], r.labels["state"]): r.value for r in df2.collect()}
    # system.cpu.time is cumulative (monotonic sum in the reference metadata)
    assert all(v2[k] >= v1[k] for k in v1)


def test_scrape_cluster_one_snapshot_per_host(spark):
    df = scrape_cluster(spark, parallelism=4, scrapers=("load", "memory"))
    rows = df.collect()
    assert rows, "cluster scrape returned nothing"
    # local mode: all slots are the same host -> exactly one point per
    # (host, scraper, metric, labels)
    keys = [(r.host, r.scraper, r.metric, tuple(sorted(r.labels.items()))) for r in rows]
    assert len(keys) == len(set(keys))
    assert DEFAULT_SCRAPERS  # imported name used
