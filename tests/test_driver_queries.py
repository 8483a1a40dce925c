"""Oracle-differential tests: every declared driver query must match its
DuckDB oracle SQL at sf0.001 (the driver re-runs the same comparison at
sf0.01).  This is the primary correctness gate (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

from .conftest import SF_DIR
from .oracle_compare import compare

# FULL registry: the ≤50 scored entries plus every fine-grained query
# the suites subsume — a suite regression must be attributable to one
# sub-query, and the fine-grained forms are product surface too.
QUERY_NAMES = sorted(suites.FULL_QUERIES.keys())


def test_registry_fits_driver_window():
    """The driver scores at most 50 registry rows; overflow silently
    drops evidence (the round-3 lesson)."""
    assert len(entrypoint.queries()) <= 50


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = suites.FULL_QUERIES[name]
    oracle = suites.FULL_ORACLE.get(name)
    df = q(spark, SF_DIR)
    if oracle is None:
        # rows-only contract (non-SQL-expressible op): smoke the query
        assert df.count() >= 0
        return
    compare(df, duck.sql(oracle))


def test_entry_smoke(spark):
    df = entrypoint.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_sql_first_interface(spark):
    """The reference's users write SQL against registered files
    (duckdb.sql); register_views gives the same shape on Spark."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        register_views,
    )
    from tests.conftest import SF_DIR

    register_views(spark, SF_DIR)
    got = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(got) == 5
    assert sum(r.n_nations for r in got) == 25


def test_multi_column_count_distinct_null_semantics(spark):
    """Pin the q11 contract (CONTRACTS.md): Spark's countDistinct(a, b)
    follows the SQL standard — a tuple is skipped when ANY member is
    NULL — which is what the oracle's FILTER replicates (DuckDB's row
    constructor would count (NULL, x) as a distinct struct)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("A", "x"), ("A", "x"), (None, "x"), ("B", None), ("B", "y")],
        "a string, b string",
    )
    got = df.agg(F.countDistinct("a", "b").alias("n")).first()["n"]
    assert got == 2  # only (A,x) and (B,y); NULL-member tuples skipped
