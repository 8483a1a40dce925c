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
    # n_shards rows: the single-partition window below is the whole
    # sequential fraction of this plan
    counts = base.groupBy("shard").agg(F.count("*").alias("n"))
    # WindowExec warns about this unpartitioned window; that is the
    # design — the frame holds exactly n_shards rows at any data scale.
    w_off = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "shard",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("shard_offset"),
    )
    return (
        ranked.join(F.broadcast(offsets), "shard")
        .withColumn(
            "row_id",
            (F.col("shard_offset") + F.col("local_rank") - 1).cast("long"),
        )
        .drop("local_rank", "shard_offset")
    )
