"""Deterministic hash-based sampling and dataset splitting.

A training-data pipeline needs splits that are (a) stable across runs
and engines (no ``rand()`` — re-running must assign every row the same
way), (b) disjoint and exhaustive, and (c) computable row-locally with
NO shuffle — at 100 TB a split must be a narrow map over the scan, never
a repartition.  The reference has no sampling surface (its whole dataset
is one user's games); this is a north-star extension.

Mechanism: bucket = shared 60-bit md5 hash (functions.hashing — bit
identical in the DuckDB oracle) of ``seed|key`` mod ``n_buckets``; a
split is a contiguous bucket range.  Changing the seed re-deals every
row; changing split percentages only moves rows across the boundary
(stable assignment, the standard hash-split property).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long, md5_long_sql

N_BUCKETS = 100


def split_bucket(key: Column, seed: str) -> Column:
    """Deterministic bucket 0..N_BUCKETS-1 for a key column."""
    return (
        md5_long(F.concat(F.lit(seed), F.lit("|"), key.cast("string"))) % N_BUCKETS
    )


def split_bucket_sql(key_expr: str, seed: str) -> str:
    h = md5_long_sql(f"concat('{seed}', '|', CAST({key_expr} AS VARCHAR))")
    return f"{h} % {N_BUCKETS}"


def hash_split(
    df: DataFrame, key: str, splits: dict[str, int], seed: str = "split0"
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split.

    ``splits`` maps name -> percentage (must sum to 100), e.g.
    ``{"train": 80, "val": 10, "test": 10}``.  Assignment is by
    contiguous bucket ranges in dict order — disjoint, exhaustive, and
    stable under re-runs.  Pure projection: no shuffle, no state.
    """
    if sum(splits.values()) != N_BUCKETS:
        raise ValueError(f"split percentages must sum to {N_BUCKETS}: {splits}")
    bucket = split_bucket(F.col(key), seed)
    expr: Column | None = None
    upper = 0
    names = list(splits.items())
    for name, pct in names[:-1]:
        upper += pct
        expr = (
            F.when(bucket < upper, F.lit(name))
            if expr is None
            else expr.when(bucket < upper, F.lit(name))
        )
    last = F.lit(names[-1][0])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def hash_split_case_sql(key_expr: str, splits: dict[str, int], seed: str = "split0") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split`."""
    b = split_bucket_sql(key_expr, seed)
    arms, upper = [], 0
    names = list(splits.items())
    for name, pct in names[:-1]:
        upper += pct
        arms.append(f"WHEN {b} < {upper} THEN '{name}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1][0]}' END"


def deterministic_sample(
    df: DataFrame, key: str, percent: int, seed: str = "sample0"
) -> DataFrame:
    """Keep a stable ``percent``% of rows by key hash.  Unlike
    ``df.sample`` this is reproducible across runs, engines, and
    repartitionings, and a row's membership never depends on which
    partition it landed in."""
    return df.where(split_bucket(F.col(key), seed) < percent)
