from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from opentelemetry_collector_spark.session import build_session

    s = build_session(master="local[4]", app_name="otelcol-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny(spark):
    """8 convs / ~40 turns deterministic transcripts (FIXTURES.md scales)."""
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    return synthesize(spark, n_convs=8, mean_turns=5, seed=42).cache()


@pytest.fixture(scope="session")
def small(spark):
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    return synthesize(spark, n_convs=200, mean_turns=10, seed=42).cache()


def rows_set(df, cols=None):
    cols = cols or df.columns
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}
