"""As-of (backward-looking temporal) join and bucketed range join.

The reference has no temporal joins (SURVEY.md §2.3 J5 notes their
absence), but any time-keyed training-data or feature pipeline needs
them: "attach the most recent dimension state at event time" (as-of) and
"attach every interval covering the event" (range).  Both are custom
operators Spark lacks natively; both are implemented here as
compositions of built-in DataFrame ops — no Pandas UDF, no per-row
search — so they stay JVM-side and scale by partitioning:

- ``asof_join``: the union-tag trick.  Right rows and left rows are
  unioned on the join key, sorted once per key by (ts, side-tag), and
  the right payload is carried forward with ``last(ignorenulls)`` over a
  running window.  ONE shuffle on the key; each partition does a single
  ordered pass.  The per-row-subquery formulation (what an interpreter
  would do, and what the reference's ``get_opening`` loop does for
  prefixes, test.ipynb cell 28) would be O(events × orders); this is
  O((events + orders) log) for the sort — the same plan at 100 TB with
  the key-space sharded across executors.

- ``bucketed_range_join``: interval containment without a cross
  product.  Each right interval is exploded to the fixed-width time
  buckets it covers; each left row has exactly ONE bucket — so the join
  is a plain equi-join on (keys…, bucket) with a residual range
  predicate, and no post-join dedup is needed (a (left,right) pair can
  only meet in the left row's single bucket).  Bucket width trades
  replication (long intervals → more bucket rows) against selectivity;
  at scale, pick it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks up ``right_payload``
    from the latest right row of the same key with
    ``right.right_ts <= left.left_ts`` (inclusive); nulls when no such
    row exists.

    ``right`` must be unique per (on…, right_ts) — pre-aggregate it if
    not (ties across rows at the same instant have no well-defined
    "latest"); callers keep that contract so the result is deterministic
    and oracle-checkable.

    NULL timestamps (CONTRACTS.md): a LEFT row with NULL ``left_ts``
    is KEPT with NULL payload (as-of is an enrichment — it must not
    drop events; NULLs sort first in the window, before any right
    state).  A RIGHT row with NULL ``right_ts`` is DROPPED here — a
    dimension state with no effective time is meaningless, and left
    in, Spark's NULLS-FIRST window order would leak it into every key
    as the fallback state while DuckDB's ASOF (NULLS-high sort) never
    would.

    NULL join keys: a RIGHT row with a NULL value in any ``on`` column
    is likewise DROPPED — SQL ASOF equality never matches NULL keys,
    but the window formulation would group all NULL-key rows together
    and carry that state into NULL-key left rows.  NULL-key LEFT rows
    are kept with NULL payload (same enrichment contract as NULL ts).
    """
    rpay = F.struct(*[F.col(c) for c in right_payload]).alias("__rpay")
    right = right.where(F.col(right_ts).isNotNull())
    for k in on:
        right = right.where(F.col(k).isNotNull())
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        rpay,
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp (__tag 0 < 1)
    # → equal-instant right state IS visible to the left row (inclusive).
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__carried", F.last("__rpay", ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("__tag") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__carried.{c}").alias(c) for c in right_payload],
        )
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_secs: int = 7 * 24 * 3600,
) -> DataFrame:
    """INNER join of left rows to every right interval containing them:
    ``right_start <= left_ts < right_end`` (half-open), equi-matched on
    ``on`` — executed as an equi-join on (on…, bucket) with the range
    predicate as a residual filter.

    Returns left.* plus right.* (callers project).  The right side is
    replicated ceil(interval/bucket)+1 times — bounded, explicit, and
    shuffle-partitioned by (keys, bucket), never a cross product.
    """
    l_bucket = F.floor(F.unix_timestamp(F.col(left_ts)) / bucket_secs)
    r_buckets = F.sequence(
        F.floor(F.unix_timestamp(F.col(right_start)) / bucket_secs),
        F.floor(F.unix_timestamp(F.col(right_end)) / bucket_secs),
    )
    lb = left.withColumn("__bucket", l_bucket)
    rb = right.withColumn("__bucket", F.explode(r_buckets))
    joined = lb.join(rb, on=[*on, "__bucket"], how="inner").where(
        (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) < F.col(right_end))
    )
    return joined.drop("__bucket")


def asof_join_naive(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
) -> DataFrame:
    """Reference implementation of ``asof_join`` via theta-join + ranked
    filter (O(matching pairs) blow-up before the rank).  Used only by
    tests to verify the union-window plan; never the execution path."""
    import functools
    import operator

    lid = left.withColumn("__lid", F.monotonically_increasing_id()).alias("l")
    r = right.alias("r")
    cond = functools.reduce(
        operator.and_, [lid[k] == r[k] for k in on]
    ) & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
    joined = lid.join(r, cond, "left")
    w = Window.partitionBy("__lid").orderBy(F.col(f"r.{right_ts}").desc_nulls_last())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            *[F.col(f"l.{c}") for c in left.columns],
            *[F.col(f"r.{c}").alias(c) for c in right_payload],
        )
    )
