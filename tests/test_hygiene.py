"""Pipeline-hygiene operators (operators/hygiene.py): integrity audit,
repeated-line dedup, per-key rate limit.

Golden semantics on hand-built frames plus the plan-shape properties that
matter at scale: one exchange per operator, map-side partial aggregation
for log_dedup, and the Partial WindowGroupLimit for rate_limit.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.hygiene import (
    integrity_audit,
    log_dedup,
    log_templates,
    rate_limit,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


TURN_COLS = "conv_id string, turn_idx int, role string, text string, ts timestamp"


@pytest.fixture(scope="module")
def audit_frame(spark):
    rows = [
        # c0: clean — contiguous idx, alternating roles, monotone ts
        ("c0", 0, "user", "hi", _ts(9)),
        ("c0", 1, "assistant", "hello", _ts(9, 5)),
        ("c0", 2, "user", "bye", _ts(9, 10)),
        # c1: duplicate idx 1 (same role -> also one echo)
        ("c1", 0, "user", "a", _ts(9)),
        ("c1", 1, "tool", "b", _ts(9, 1)),
        ("c1", 1, "tool", "b2", _ts(9, 2)),
        # c2: gap (idx 0,1,3) — one missing position
        ("c2", 0, "user", "a", _ts(9)),
        ("c2", 1, "assistant", "b", _ts(9, 1)),
        ("c2", 3, "user", "c", _ts(9, 3)),
        # c3: NULL idx row (junk) + otherwise clean pair
        ("c3", 0, "user", "a", _ts(9)),
        ("c3", None, "assistant", "b", _ts(9, 1)),
        ("c3", 1, "user", "c", _ts(9, 2)),
        # c4: ts regression at idx 2 (backdated write), roles alternate
        ("c4", 0, "user", "a", _ts(9)),
        ("c4", 1, "assistant", "b", _ts(9, 5)),
        ("c4", 2, "user", "c", _ts(8)),
    ]
    return rows


def test_integrity_audit_flags(spark, audit_frame):
    df = spark.createDataFrame(audit_frame, TURN_COLS)
    got = {r["conv_id"]: r.asDict() for r in integrity_audit(df).collect()}

    assert got["c0"] == {
        "conv_id": "c0", "n_turns": 3, "n_dup_idx": 0, "n_gaps": 0,
        "n_null_idx": 0, "n_role_echo": 0, "n_ts_regress": 0, "clean": 1,
    }
    c1 = got["c1"]
    assert (c1["n_dup_idx"], c1["n_role_echo"], c1["clean"]) == (1, 1, 0)
    # a duplicated position is NOT a gap: [0,1] span fully covered
    assert c1["n_gaps"] == 0
    c2 = got["c2"]
    assert (c2["n_gaps"], c2["n_dup_idx"], c2["clean"]) == (1, 0, 0)
    c3 = got["c3"]
    # NULL idx counted separately; dup/gap math unpoisoned
    assert (c3["n_null_idx"], c3["n_dup_idx"], c3["n_gaps"], c3["clean"]) == (1, 0, 0, 0)
    c4 = got["c4"]
    assert (c4["n_ts_regress"], c4["n_role_echo"], c4["clean"]) == (1, 0, 0)


def test_integrity_audit_single_conv_column_and_empty(spark):
    df = spark.createDataFrame([], TURN_COLS)
    assert integrity_audit(df).count() == 0
    one = spark.createDataFrame([("c", 0, "user", "x", _ts(9))], TURN_COLS)
    row = integrity_audit(one).collect()[0]
    assert (row["n_turns"], row["clean"]) == (1, 1)


def test_integrity_audit_one_exchange(spark, audit_frame):
    df = spark.createDataFrame(audit_frame, TURN_COLS)
    plan = _plan(integrity_audit(df))
    # window + groupBy share hashpartitioning(conv_id): the countDistinct
    # expand re-aggregates but must not re-shuffle on a different key
    assert plan.count("Exchange hashpartitioning(conv_id") >= 1
    assert plan.count("Exchange hashpartitioning") == plan.count(
        "Exchange hashpartitioning(conv_id"
    )


def test_log_dedup_collapses_and_keeps_first(spark):
    rows = [
        ("c0", 0, "user", "retry me", _ts(9)),
        ("c0", 1, "user", "retry me", _ts(9, 1)),
        ("c0", 5, "user", "retry me", _ts(9, 5)),
        ("c0", 2, "assistant", "unique", _ts(9, 2)),
        ("c1", 0, "user", "retry me", _ts(10)),  # other conv: own group
    ]
    df = spark.createDataFrame(rows, TURN_COLS)
    out = {(r["conv_id"], r["text"]): r.asDict() for r in log_dedup(df).collect()}
    assert len(out) == 3
    storm = out[("c0", "retry me")]
    assert (storm["turn_idx"], storm["role"], storm["n_occurrences"], storm["last_idx"]) == (
        0, "user", 3, 5,
    )
    assert storm["ts"] == _ts(9)
    assert out[("c0", "unique")]["n_occurrences"] == 1
    assert out[("c1", "retry me")]["n_occurrences"] == 1
    # fingerprint is engine-portable md5 hex of the utf-8 text
    import hashlib

    assert storm["text_fp"] == hashlib.md5(b"retry me").hexdigest()


def test_log_dedup_row_count_is_distinct_lines(spark, small):
    out = log_dedup(small)
    expected = small.select("conv_id", "text").distinct().count()
    assert out.count() == expected
    # suppressed stream never exceeds the input
    assert out.count() <= small.count()


def test_log_dedup_partial_aggregation_before_exchange(spark, small):
    plan = _plan(log_dedup(small))
    assert plan.count("Exchange hashpartitioning") == 1
    # map-side combine: a partial HashAggregate/ObjectHashAggregate appears
    # below (after, in print order) the exchange line
    exch = plan.find("Exchange hashpartitioning")
    assert "partial" in plan[exch:].lower()
    assert "Window" not in plan  # groupBy formulation, not a window scan


def test_rate_limit_quota_and_determinism(spark):
    rows = [
        ("c0", 0, "user", "a", _ts(9, 0)),
        ("c0", 1, "user", "b", _ts(9, 10)),
        ("c0", 2, "user", "c", _ts(9, 20)),
        ("c0", 3, "user", "d", _ts(10, 0)),   # next hour bucket
        ("c1", 0, "user", "e", _ts(9, 30)),   # other key: own quota
        ("c1", 1, "user", "f", None),          # junk ts -> own NULL bucket
        ("c1", 2, "user", "g", None),
        ("c1", 3, "user", "h", None),
    ]
    df = spark.createDataFrame(rows, TURN_COLS)
    out = rate_limit(df, max_per_window=2, window="hour")
    kept = {(r["conv_id"], r["turn_idx"]) for r in out.collect()}
    # c0 9am bucket: first two by (ts, idx); 10am bucket: its only row;
    # c1: real-ts row alone in its bucket, NULL bucket keeps first 2 by idx
    assert kept == {("c0", 0), ("c0", 1), ("c0", 3), ("c1", 0), ("c1", 1), ("c1", 2)}
    ws = {r["turn_idx"]: r["window_start"] for r in out.filter("conv_id='c0'").collect()}
    assert ws[0] == _ts(9) and ws[3] == _ts(10)
    # NULL-ts rows were quota'd among themselves (2 of 3 kept), not fatal
    assert ("c1", 3) not in kept


def test_rate_limit_rejects_zero_quota(spark):
    df = spark.createDataFrame([], TURN_COLS)
    with pytest.raises(ValueError, match="max_per_window"):
        rate_limit(df, max_per_window=0)


def test_rate_limit_partial_window_group_limit(spark, small):
    plan = _plan(rate_limit(small, max_per_window=3, window="day"))
    assert "WindowGroupLimit" in plan
    partial_pos = plan.find("row_number(), 3, Partial")
    exch_pos = plan.find("Exchange hashpartitioning(conv_id")
    # printed top-down: the Partial limit sits BELOW the exchange, i.e.
    # upstream in dataflow — each map task ships at most k rows per bucket
    assert partial_pos != -1 and exch_pos != -1 and partial_pos > exch_pos


def test_null_idx_junk_matches_duckdb_oracle_ordering(spark):
    """NULL-idx junk rows order FIRST in both engines (regression: the q69/
    q70 oracle SQL defaulted to DuckDB's NULLS LAST, diverging from Spark's
    nulls-first windows and struct-min exactly on the junk class the
    operators advertise handling)."""
    import duckdb

    rows = [
        # nulls-first order visits (NULL, 0, 1): no echo, one ts regression
        # (row idx=0 is earlier than the NULL row before it). NULLS LAST
        # would instead see echo=1, regress=0 — the exact divergence the
        # oracle previously had.
        ("c", 0, "user", "dup line", _ts(9, 0)),
        ("c", 1, "assistant", "x", _ts(9, 1)),
        ("c", None, "assistant", "dup line", _ts(9, 2)),
    ]
    df = spark.createDataFrame(rows, TURN_COLS)
    con = duckdb.connect()
    con.register("t", df.toPandas())

    audit = integrity_audit(df).collect()[0]
    oracle = con.execute(
        """
        WITH x AS (
          SELECT role, ts,
                 CASE WHEN role = lag(role) OVER w THEN 1 END AS echo,
                 CASE WHEN ts < lag(ts) OVER w THEN 1 END AS regress
          FROM t WINDOW w AS (PARTITION BY conv_id
            ORDER BY turn_idx NULLS FIRST, ts NULLS FIRST, role NULLS FIRST))
        SELECT coalesce(sum(echo), 0), coalesce(sum(regress), 0) FROM x
        """
    ).fetchone()
    assert (audit["n_role_echo"], audit["n_ts_regress"]) == oracle
    assert audit["n_null_idx"] == 1

    dedup = {r["text"]: r for r in log_dedup(df).collect()}
    survivor = con.execute(
        """
        SELECT turn_idx, role FROM (
          SELECT turn_idx, role, row_number() OVER (
            PARTITION BY conv_id, text
            ORDER BY turn_idx NULLS FIRST, ts NULLS FIRST, role NULLS FIRST) rn
          FROM t WHERE text = 'dup line') WHERE rn = 1
        """
    ).fetchone()
    # Spark min(struct) treats the NULL idx as smallest -> same survivor
    assert (dedup["dup line"]["turn_idx"], dedup["dup line"]["role"]) == survivor
    assert survivor[0] is None and dedup["dup line"]["n_occurrences"] == 2


def test_log_templates_masking_and_volume(spark):
    rows = [
        ("c1", 0, "user", "clicked item 37", _ts(1)),
        ("c1", 1, "user", "clicked item 99", _ts(2)),
        ("c2", 0, "user", "clicked item 37", _ts(3)),
        ("c1", 2, "tool", "req deadbeef01 failed", _ts(4)),
        ("c1", 3, "tool", "req CAFEBABE99 failed", _ts(5)),
        ("c1", 4, "user", "no variables here", _ts(6)),
    ]
    df = spark.createDataFrame(rows, TURN_COLS)
    got = {
        (r["role"], r["template"]): (r["n_lines"], r["n_variants"], r["first_idx"], r["example"])
        for r in log_templates(df).collect()
    }
    # digit runs masked; 3 lines but only 2 distinct raw variants
    assert got[("user", "clicked item <N>")] == (3, 2, 0, "clicked item 37")
    # hex ids (>=8 chars) masked BEFORE digits
    assert got[("tool", "req <HEX> failed")] == (2, 2, 2, "req deadbeef01 failed")
    assert got[("user", "no variables here")] == (1, 1, 4, "no variables here")


def test_log_templates_digest_grouped_plan(spark):
    df = spark.createDataFrame([("c", 0, "user", "x 1", _ts(9))], TURN_COLS)
    plan = _plan(log_templates(df))
    # groupBy on md5(template): map-side partial aggregation (partial_min /
    # partial_count upstream of the exchange; SortAggregate, since a
    # min-of-struct isn't hash-aggregable), and never a Window over the
    # raw stream
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_count" in plan
    # both exchanges carry the template digest key, never raw text alone
    assert plan.count("Exchange hashpartitioning(role") == plan.count(
        "Exchange hashpartitioning"
    )


def test_sliding_window_counts_golden(spark):
    from opentelemetry_collector_spark.operators.hygiene import sliding_window_counts

    # user u: events at 0s, 30m, 59m59s, 61m, and a same-instant pair at 2h
    rows = [
        ("u", 1, _ts(0, 0, 0)),
        ("u", 2, _ts(0, 30, 0)),
        ("u", 3, _ts(0, 59, 59)),
        ("u", 4, _ts(1, 1, 0)),
        ("u", 5, _ts(2, 0, 0)),
        ("u", 6, _ts(2, 0, 0)),
        ("v", 7, _ts(0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "user string, id int, ts timestamp")
    out = {
        r["id"]: (r["n_trailing"], r["burst"])
        for r in sliding_window_counts(
            df, ["user"], range_seconds=3600, burst_threshold=3
        ).collect()
    }
    assert out[1] == (1, 0)
    assert out[2] == (2, 0)
    assert out[3] == (3, 1)            # 0s is still inside the inclusive hour
    assert out[4] == (3, 1)            # 0s aged out; 30m/59m59s/self remain
    # trailing hour at 2h covers 1h..2h: event 4 (1h01) + the pair itself;
    # the same-instant events are frame peers and count together
    assert out[5] == (3, 1) and out[6] == (3, 1)
    assert out[7] == (1, 0)            # other keys never leak in


def test_sliding_window_single_exchange_range_frame(spark):
    from opentelemetry_collector_spark.operators.hygiene import sliding_window_counts

    df = spark.createDataFrame([("u", _ts(0))], "user string, ts timestamp")
    plan = _plan(sliding_window_counts(df, ["user"], range_seconds=60))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "RangeFrame" in plan  # a value-range frame, not a RowFrame
    import pytest as _pytest

    with _pytest.raises(ValueError, match="range_seconds"):
        sliding_window_counts(df, ["user"], range_seconds=0)


def test_trending_templates_golden(spark):
    from opentelemetry_collector_spark.operators.hygiene import trending_templates

    split = "2024-01-01 12:00:00"
    rows = [
        # template "err <N>": 2 before, 4 after -> lift 2.0x
        ("c1", 0, "tool", "err 1", _ts(10)),
        ("c1", 1, "tool", "err 2", _ts(11)),
        ("c1", 2, "tool", "err 3", _ts(12)),          # boundary: >= split is cur
        ("c1", 3, "tool", "err 4", _ts(13)),
        ("c1", 4, "tool", "err 5", _ts(14)),
        ("c1", 5, "tool", "err 6", _ts(15)),
        # brand-new template after the split
        ("c2", 0, "tool", "oom killed 123", _ts(13)),
        # template that disappeared
        ("c3", 0, "tool", "legacy warn 7", _ts(9)),
        # NULL ts: in neither period
        ("c4", 0, "tool", "err 9", None),
    ]
    df = spark.createDataFrame(rows, TURN_COLS)
    got = {
        r["template"]: (r["n_prev"], r["n_cur"], r["lift_ppm"], r["is_new"])
        for r in trending_templates(df, split_ts=split).collect()
    }
    assert got["err <N>"] == (2, 4, 2_000_000, False)
    assert got["oom killed <N>"] == (0, 1, 1_000_000, True)
    assert got["legacy warn <N>"] == (1, 0, 0, False)


def test_trending_templates_single_digest_aggregate_plan(spark):
    """Both period counts must ride ONE digest-keyed aggregate: exactly one
    exchange, partial sums before it, no join and no window."""
    from opentelemetry_collector_spark.operators.hygiene import trending_templates

    df = spark.createDataFrame([("c", 0, "user", "x 1", _ts(9))], TURN_COLS)
    plan = _plan(trending_templates(df, split_ts="2024-01-01 12:00:00"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan or "partial_min" in plan
    assert "Join" not in plan and "Window" not in plan
