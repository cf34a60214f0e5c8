"""As-of join operator (operators/asof.py) — tie semantics, null payloads,
left-join behavior, and the no-range-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("c1", 1), ("c1", 4), ("c1", 6), ("c2", 2)], "k string, t int"
    )
    right = spark.createDataFrame(
        [("c1", 1, "a", 10), ("c1", 4, "b", None), ("c1", 5, "c", 30)],
        "k string, t int, v string, extra int",
    )
    return left, right


def _run(spark, strict):
    left, right = _frames(spark)
    out = asof_join(
        left, right, keys=["k"], order_col="t", payload_cols=["v", "extra"], strict=strict
    )
    return {(r["k"], r["t"]): (r["v"], r["extra"]) for r in out.collect()}


def test_strict_excludes_equal_order_rows(spark):
    got = _run(spark, strict=True)
    assert got[("c1", 1)] == (None, None)  # nothing strictly before t=1
    assert got[("c1", 4)] == ("a", 10)  # t=4 right row invisible under <
    assert got[("c1", 6)] == ("c", 30)
    assert got[("c2", 2)] == (None, None)  # key with no right rows at all


def test_non_strict_includes_equal_order_rows(spark):
    got = _run(spark, strict=False)
    assert got[("c1", 1)] == ("a", 10)
    assert got[("c1", 4)] == ("b", None)  # matched row's NULL payload survives
    assert got[("c1", 6)] == ("c", 30)


def test_payload_columns_come_from_the_same_right_row(spark):
    # the t=4 right row has extra=NULL: a per-column last(ignorenulls) would
    # leak extra=10 from the t=1 row next to v='b' — the struct transport
    # must keep (v, extra) paired
    got = _run(spark, strict=False)
    assert got[("c1", 4)] == ("b", None)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.sampled_from(["k1", "k2", "k3"]),  # key
    st.integers(0, 50),  # order value
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    left_rows=st.lists(_row, min_size=1, max_size=15),
    right_rows=st.lists(_row, min_size=0, max_size=15, unique=True),
    strict=st.booleans(),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows, strict):
    """Independent oracle: pandas.merge_asof(direction='backward') with
    allow_exact_matches = not strict, per key."""
    import pandas as pd

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "k string, t int, lid int"
    )
    right = spark.createDataFrame(
        [(k, t, f"v{k}@{t}") for k, t in right_rows], "k string, t int, v string"
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, keys=["k"], order_col="t", payload_cols=["v"], strict=strict
        ).collect()
    }

    lp = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(left_rows)], columns=["k", "t", "lid"])
    rp = pd.DataFrame([(k, t, f"v{k}@{t}") for k, t in right_rows], columns=["k", "t", "v"]).astype(
        {"k": "object", "t": "int64", "v": "object"}
    )
    exp_df = pd.merge_asof(
        lp.sort_values("t", kind="stable"),
        rp.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=not strict,
    )
    exp = {int(r.lid): (None if pd.isna(r.v) else r.v) for r in exp_df.itertuples()}
    assert got == exp


def test_plan_has_no_join_and_one_key_exchange(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, keys=["k"], order_col="t", payload_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, never a range join
    assert "Window" in plan
    assert plan.count("Exchange") == 1  # one hashpartitioning(k) shuffle


def test_asof_null_order_right_rows_never_match(spark):
    """A right row with a NULL order value precedes nothing (DuckDB ASOF
    parity): pre-fix it sorted nulls-first and leaked its payload into
    every left row before the first real right row."""
    from opentelemetry_collector_spark.operators.asof import asof_join

    left = spark.createDataFrame([("c1", 1), ("c1", 5)], "conv_id string, t int")
    right = spark.createDataFrame(
        [("c1", None, "junk"), ("c1", 3, "real")],
        "conv_id string, t int, payload string",
    )
    out = {r.t: r.payload for r in
           asof_join(left, right, ["conv_id"], "t", ["payload"]).collect()}
    assert out == {1: None, 5: "real"}


def test_dimension_intervals_scd2_semantics(spark):
    """Half-open validity intervals from a change log: next change closes
    the previous one, the latest stays open (NULL valid_to), ties collapse
    to zero-length intervals for all but the tiebreak winner."""
    import datetime as dt

    from opentelemetry_collector_spark.operators.asof import dimension_intervals

    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("k1", ts(0), 1, "v1"),
        ("k1", ts(10), 2, "v2"),
        ("k1", ts(10), 3, "v2b"),  # tie: seq 3 wins the open-ended slot
        ("k1", ts(20), 4, "v3"),
        ("k2", ts(5), 1, "w1"),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, seq int, val string")
    got = {
        (r["key"], r["seq"]): (r["valid_from"], r["valid_to"])
        for r in dimension_intervals(df, ["key"], tiebreak=["seq"]).collect()
    }
    naive = lambda x: x.replace(tzinfo=None)
    assert got[("k1", 1)] == (naive(ts(0)), naive(ts(10)))
    assert got[("k1", 2)] == (naive(ts(10)), naive(ts(10)))  # zero-length tie
    assert got[("k1", 3)] == (naive(ts(10)), naive(ts(20)))
    assert got[("k1", 4)] == (naive(ts(20)), None)  # current version open
    assert got[("k2", 1)] == (naive(ts(5)), None)

    plan = (
        dimension_intervals(df, ["key"], tiebreak=["seq"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
