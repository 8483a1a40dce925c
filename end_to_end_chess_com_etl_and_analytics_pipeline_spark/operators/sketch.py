"""Count-min sketch: mergeable one-pass frequency estimation.

The 100 TB problem: finding heavy hitters over an unbounded key domain
(URLs, n-grams, user ids across a year of logs) with ``groupBy(key)``
shuffles the full distinct-key set — at corpus scale that is itself a
multi-TB exchange whose reducer memory grows with cardinality.  The
count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") bounds the
state at ``D × W`` integer cells regardless of key cardinality:

    cell(i, j) = Σ count(k) for every key k with h_i(k) ≡ j (mod W)
    est(k)     = min_i cell(i, h_i(k) mod W)

Guarantees: ``est ≥ exact`` always (counts only ever add), and
``est ≤ exact + εN`` with probability 1−δ for ``W = ⌈e/ε⌉``,
``D = ⌈ln 1/δ⌉``.  The sketch is LINEAR in the input counts, which buys
the two properties that matter on a cluster:

- **map-side bound**: building cells through ``groupBy(seed, bucket)``
  partial-aggregates to at most D·W cells per task before the exchange,
  so the shuffle is O(D·W·n_partitions) bytes — independent of both row
  count and key cardinality;
- **mergeability**: sketch(A ∪ B) = cellwise-sum(sketch(A), sketch(B)),
  so per-micro-batch sketches append-merge into a running sketch with
  no reprocessing (the streaming twin, st09).

Hash functions are the repo's shared 60-bit md5 contract
(``functions.hashing``) so the DuckDB oracle reproduces every cell —
and therefore every estimate — bit-exactly: the driver hash-compares
estimates, not just bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long_seeded

# D = 3 seeded hash rows × W = 1024 buckets → 3072 BIGINT cells
# (≈ 24 KiB): broadcastable at any input scale.
CMS_SEEDS: tuple[int, ...] = (71, 72, 73)
CMS_W = 1024


def cms_probes(item_str: Column, w: int = CMS_W) -> Column:
    """array<struct<seed,bucket>> — the D cells an item touches."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                (md5_long_seeded(item_str, s) % w).alias("bucket"),
            )
            for s in CMS_SEEDS
        ]
    )


def _probed(items: DataFrame, item: str, w: int) -> DataFrame:
    """One row per (input row, seed): the exploded cell coordinates."""
    keep = [c for c in items.columns if c != item]
    return items.select(
        F.col(item),
        *keep,
        F.explode(cms_probes(F.col(item).cast("string"), w)).alias("__p"),
    ).select(F.col(item), *keep, "__p.seed", "__p.bucket")


def cms_cells(
    items: DataFrame, item: str = "item", weight: str | None = None, w: int = CMS_W
) -> DataFrame:
    """Build the sketch: (seed, bucket, cell_cnt) with at most D·W rows.

    ``weight=None`` counts raw occurrence rows (the streaming per-batch
    form — one pass, no pre-aggregation); passing a count column builds
    the identical sketch from pre-aggregated (item, cnt) rows (the
    batch form — the sketch is linear in counts, so both constructions
    are equal cell-for-cell)."""
    pr = _probed(
        items.select(item, weight) if weight else items.select(item), item, w
    )
    agg = (
        F.sum(F.col(weight)).alias("cell_cnt")
        if weight
        else F.count("*").alias("cell_cnt")
    )
    return pr.groupBy("seed", "bucket").agg(agg)


def cms_estimate(
    candidates: DataFrame, cells: DataFrame, item: str = "item", w: int = CMS_W
) -> DataFrame:
    """Point-query the sketch for every candidate row: adds an
    ``est_cnt`` column = min over the D cells the item hashes to.

    The cells frame is ≤ D·W rows → broadcast; the probe explode is a
    scan-local ×D projection — no exchange is added beyond the
    candidate frame's own lineage."""
    pr = _probed(candidates, item, w)
    keys = [c for c in candidates.columns]
    # Left join + coalesce: a candidate whose D cells are all absent from
    # the sketch must still surface with est_cnt = 0, not vanish (CMS is a
    # point-query structure — every query has a defined answer).
    return (
        pr.join(F.broadcast(cells), ["seed", "bucket"], "left")
        .withColumn("cell_cnt", F.coalesce(F.col("cell_cnt"), F.lit(0).cast("long")))
        .groupBy(*keys)
        .agg(F.min("cell_cnt").alias("est_cnt"))
    )
