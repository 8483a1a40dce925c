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
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import extensions as _ext  # noqa: E402
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import pipelines as _pipe  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (scan → filter → hash aggregate) on sf0.001."""
    return _driver.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Registry order is evidence order: the driver's correctness sweep
    records the first 50 entries, so the chess medallion family
    (c01-c06), streaming (st01-st05), multimodal (m01-m02) and the
    extension operators lead; the relational q-family (two rounds of
    green driver evidence already) fills the tail.  The committed
    full-registry sweep (SWEEP_r{N}.txt, tools/local_sweep.py) covers
    every entry regardless of window."""
    return {**_pipe.PIPELINE_QUERIES, **_ext.EXT_QUERIES, **_driver.QUERIES}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only
    for genuinely non-SQL-expressible ops → rows-only check)."""
    return {**_pipe.PIPELINE_ORACLE, **_ext.EXT_ORACLE, **_driver.ORACLE}
