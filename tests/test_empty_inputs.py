"""Empty-input sweep: every driver query must plan and execute over empty
tables without raising — at 100 TB empty partitions, empty time slices, and
empty routed subsets are routine, and an operator that crashes on zero rows
is an operator that crashes in production."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans.queries import QUERIES


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-factor dir with every table present but zero rows (schemas
    cloned from the real sf0.001 fixtures)."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_empty")
    for name in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(str(dst / f"{name}.parquet"))
    return str(dst)


# queries whose correct answer over an empty table is NON-empty summary rows
# (the row-per-shape is the point); each maps to a validator over its rows
_NONEMPTY_ON_EMPTY = {
    "q118_table_profile": lambda r: (
        r["n_rows"] == 0 and r["n_nulls"] == 0 and r["n_distinct"] == 0
    ),
    "q119_event_funnel": lambda r: r["n_users"] == 0,
    "q121_referential_audit": lambda r: (
        r["n_child"] == 0 and r["n_orphans"] == 0 and r["n_null_keys"] == 0
    ),
    "q128_audience_overlap": lambda r: r["n_users"] == 0,
    "q174_join_size_guard": lambda r: (
        r["n_left_rows"] == 0 and r["est_rows"] == 0 and r["max_key_rows"] == 0
    ),
}


# queries whose input is a COMMITTED fixture corpus, not the sf tables —
# their output is the same regardless of sf_dir (q185: the 8-host /proc
# fixture parses to its 616 points even when every table is empty)
_FIXTURE_INPUT = {"q185_hostmetrics_fixture"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    out = QUERIES[name](spark, empty_sf_dir)
    if name in _NONEMPTY_ON_EMPTY:
        rows = out.collect()
        assert rows and all(_NONEMPTY_ON_EMPTY[name](r) for r in rows)
    elif name in _FIXTURE_INPUT:
        assert out.count() > 0  # fixture-driven: sf_dir does not feed it
    else:
        assert out.count() == 0
    assert len(out.schema.fields) > 0  # schema stays stable with no rows
