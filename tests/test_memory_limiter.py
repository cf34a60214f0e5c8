"""Memory limiter batch-admission tests.

Modeled on processor/memorylimiter/memorylimiter_test.go (construction error
table, forced-drop refusal path) — adapted to the deterministic byte-budget
batch admission analog (see operators/memory_limiter.py docstring).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.memory_limiter import (
    MIB,
    ROW_OVERHEAD_BYTES,
    MemoryLimiterConfig,
    admission_report,
    memory_limit,
    with_admission,
)


# --- construction errors (memorylimiter.go:42-56, newFixedMemUsageChecker) --


def test_zero_limit_rejected():
    with pytest.raises(ValueError, match="greater than zero"):
        MemoryLimiterConfig(limit_mib=0)


def test_negative_limit_rejected():
    with pytest.raises(ValueError, match="greater than zero"):
        MemoryLimiterConfig(limit_mib=-1)


def test_spike_must_be_smaller_than_limit():
    with pytest.raises(ValueError, match="smaller than memAllocLimit"):
        MemoryLimiterConfig(limit_mib=10, spike_limit_mib=10)


def test_default_spike_is_twenty_percent():
    cfg = MemoryLimiterConfig(limit_mib=10)
    assert cfg.spike_bytes == cfg.limit_bytes // 5
    assert cfg.soft_limit_bytes == cfg.limit_bytes - cfg.limit_bytes // 5


def test_explicit_spike_respected():
    cfg = MemoryLimiterConfig(limit_mib=10, spike_limit_mib=2)
    assert cfg.soft_limit_bytes == 8 * MIB


# --- admission semantics ----------------------------------------------------


def _df(spark):
    # conv big: 3 rows x 400B text -> 3*(400+64) = 1392 B
    # conv small: 2 rows x 10B text -> 2*(10+64) = 148 B
    rows = [("big", i, "user", "x" * 400, None) for i in range(3)] + [
        ("small", i, "user", "y" * 10, None) for i in range(2)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )


def _cfg_soft(soft_bytes: int) -> MemoryLimiterConfig:
    """Config whose soft limit is exactly soft_bytes (spike = 20% default)."""
    return MemoryLimiterConfig(limit_mib=soft_bytes / MIB / 0.8)


def test_whole_batch_refused_never_row_sliced(spark):
    df = _df(spark)
    cfg = _cfg_soft(1000)  # big (1392) refused, small (148) accepted
    out = memory_limit(df, cfg).collect()
    assert {r.conv_id for r in out} == {"small"}
    assert len(out) == 2  # the whole small batch, no partial big batch
    assert sorted(memory_limit(df, cfg).columns) == sorted(df.columns)


def test_all_accepted_below_soft_limit(spark):
    df = _df(spark)
    out = memory_limit(df, MemoryLimiterConfig(limit_mib=1))
    assert out.count() == df.count()


def test_accepted_plus_refused_is_total(spark):
    df = _df(spark)
    rep = {r.status: (r.n_batches, r.n_records) for r in admission_report(df, _cfg_soft(1000)).collect()}
    assert rep == {"accepted": (1, 2), "refused": (1, 3)}


def test_byte_estimate_counts_tool_and_overhead(spark):
    rows = [("c", 0, "tool", "ab", "calc")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    got = with_admission(df, MemoryLimiterConfig(limit_mib=1)).collect()[0]
    assert got._batch_bytes == 2 + 4 + ROW_OVERHEAD_BYTES


def test_boundary_at_soft_limit_refuses(spark):
    # aboveSoftLimit is >= (memorylimiter.go:305-307): exactly-at-limit refuses
    rows = [("c", 0, "user", "x" * 36, None)]  # 36 + 64 = 100 bytes
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    assert memory_limit(df, _cfg_soft(100)).count() == 0
    assert memory_limit(df, _cfg_soft(101)).count() == 1


def test_config_driven_memory_limiter(spark, tmp_path):
    """memory_limiter as a pipeline processor via the config compiler."""
    from opentelemetry_collector_spark.config import run_config

    src = str(tmp_path / "in.parquet")
    _df(spark).write.parquet(src)
    out_path = str(tmp_path / "out")
    spec = {
        "receivers": {"transcripts/in": {"path": src}},
        "processors": {"memory_limiter": {"limit_mib": 1000 / MIB / 0.8}},
        "exporters": {"parquet/out": {"path": out_path}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["transcripts/in"],
                    "processors": ["memory_limiter"],
                    "exporters": ["parquet/out"],
                }
            }
        },
    }
    res = run_config(spark, spec, base_path=str(tmp_path / "run"))
    out = spark.read.parquet(out_path)
    assert {r.conv_id for r in out.select("conv_id").distinct().collect()} == {"small"}
    assert res["logs"].sink_rows["parquet_out"] == 2


def test_missing_limit_is_config_error(spark):
    from opentelemetry_collector_spark.config import ConfigError, compile_config

    spec = {
        "receivers": {"synthetic/a": {"n_convs": 2}},
        "processors": {"memory_limiter": {}},
        "exporters": {"parquet/out": {"path": "/tmp/x"}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["synthetic/a"],
                    "processors": ["memory_limiter"],
                    "exporters": ["parquet/out"],
                }
            }
        },
    }
    with pytest.raises(ConfigError, match="greater than zero"):
        compile_config(spark, spec)
