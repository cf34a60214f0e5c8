"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship parse->enrich->route->aggregate pipeline at sf0.001
queries()     -> one entry per implemented operator (SURVEY.md §2)
oracle_sql()  -> matching DuckDB SQL per query (CORRECTNESS gate)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from opentelemetry_collector_spark.plans.queries import q00_pipeline_e2e

    return q00_pipeline_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opentelemetry_collector_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from opentelemetry_collector_spark.plans.queries import ORACLES

    return dict(ORACLES)
