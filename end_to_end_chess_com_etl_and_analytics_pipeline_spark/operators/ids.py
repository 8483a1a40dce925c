"""Stable consecutive row enumeration without a global sort.

``ROW_NUMBER() OVER (ORDER BY key)`` forces every row through one
machine — the classic scale cliff.  The distributed form is two-phase
(Spark's ``zipWithIndex`` trick, expressed relationally):

1. shard rows deterministically; rank *within* each shard — one
   shuffle, fully parallel;
2. turn the per-shard counts (an ``n_shards``-row side table) into
   cumulative starting offsets and broadcast them back;
   ``global_id = shard_offset + local_rank - 1``.

The result is exactly ``ROW_NUMBER() OVER (ORDER BY shard, key) - 1``:
dense, gap-free, deterministic across runs/partitionings — but the only
single-threaded step touches ``n_shards`` rows, not the corpus.  When
ids only need to be *unique* (not dense), use
``monotonically_increasing_id`` instead — zero shuffles, zero passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_offsets(
    counts: DataFrame, shard_col: str, sum_cols: dict[str, str]
) -> DataFrame:
    """Exclusive running totals over a tiny per-shard aggregate
    (≤ n_shards rows), computed IN-PLAN as a triangular broadcast
    self-join: for each shard, sum every column in ``sum_cols``
    (src → dst name) over the shards that sort strictly before it
    (NULL shard first, mirroring SQL's NULLS FIRST window order).

    Replaces the two rejected alternatives for the shard-offset
    pattern: an unpartitioned ``Window.orderBy(shard)`` (correct and
    bounded, but WindowExec logs the exact ``No Partition Defined``
    warning that flags REAL scale bugs elsewhere — it cried wolf in
    every bench tail) and a driver-side ``collect()`` of the counts
    (silent about WindowExec, but freezes the offsets at plan-BUILD
    time, so a re-executed plan over changed data computes from stale
    offsets).  The join is a ≤ n_shards² nested-loop over a broadcast
    side — O(32²) work at any data scale — and the offsets re-derive
    from the live aggregate on every execution."""
    a, b = counts.alias("__a"), counts.alias("__b")
    sh_a, sh_b = F.col(f"__a.{shard_col}"), F.col(f"__b.{shard_col}")
    before = (sh_b < sh_a) | (sh_b.isNull() & sh_a.isNotNull())
    return (
        a.join(F.broadcast(b), before, "left")
        .groupBy(sh_a.alias(shard_col))
        .agg(
            *(
                F.coalesce(F.sum(F.col(f"__b.{src}")), F.lit(0)).alias(dst)
                for src, dst in sum_cols.items()
            )
        )
    )


def stable_row_ids(
    df: DataFrame,
    key_col: str,
    n_shards: int = 64,
    shard: Column | None = None,
) -> DataFrame:
    """Append a dense 0-based ``row_id`` ordered by (shard, key).

    ``shard`` defaults to ``pmod(key, n_shards)`` (numeric keys); pass
    any deterministic expression for other key types.  ``key_col`` must
    be unique within a shard for the ordering to be total.
    """
    key = F.col(key_col)
    if shard is None:
        shard = F.pmod(key, F.lit(n_shards)).cast("long")
    base = df.withColumn("shard", shard)
    w_local = Window.partitionBy("shard").orderBy(key_col)
    ranked = base.withColumn("local_rank", F.row_number().over(w_local))
    # n_shards rows: the triangular offset join is the whole sequential
    # fraction of this plan
    counts = base.groupBy("shard").agg(F.count("*").alias("n"))
    offsets = shard_offsets(counts, "shard", {"n": "shard_offset"})
    return (
        ranked.join(F.broadcast(offsets), "shard")
        .withColumn(
            "row_id",
            (F.col("shard_offset") + F.col("local_rank") - 1).cast("long"),
        )
        .drop("local_rank", "shard_offset")
    )
