"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``end_to_end_chess_com_etl_and_analytics_pipeline_spark``
package; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import driver as _driver  # noqa: E402
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites as _suites  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (scan → filter → hash aggregate) on sf0.001."""
    return _driver.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    The registry holds ≤50 entries — the driver's scoring window — so
    every operator gets driver evidence every round.  Related
    fine-grained queries are folded into tagged-union suites
    (plans.suites); the fine-grained forms stay individually runnable
    and are covered by the committed full sweep (SWEEP_r{N}.txt via
    tools/local_sweep.py) plus tests."""
    return dict(_suites.REGISTRY_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only
    for genuinely non-SQL-expressible ops → rows-only check)."""
    return dict(_suites.REGISTRY_ORACLE)
