"""Distributed Lloyd's k-means over an embedding column.

The iterative-algorithm companion to operators/graph.py: IVF search
(operators.similarity) needs coarse centroids from somewhere — this
produces them from the data itself.  Design for scale:

- centroids are SMALL (k × dim) by construction, so each round collects
  them to the driver and re-broadcasts literals — the corpus is never
  shuffled for the assignment step (narrow broadcast-join + argmin).
- the only shuffle per round is the (cell, pos) partial-mean — map-side
  combined, k × dim groups regardless of corpus size.
- distance/argmin are built-in higher-order functions (zip_with +
  aggregate), whole-stage codegen'd; no Python in the per-row path.
- deterministic: init = embeddings of the k lowest vec_ids, argmin ties
  break on the lower centroid id, fixed round count — reproducible for
  the numpy-differential test (tests/test_sampling_graph.py).

Driver check is rows-only (float mean order makes bit-exact SQL oracles
unreasonable); accuracy is pinned against numpy instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_dist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def assign_nearest(
    vectors: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cluster_id`` = argmin squared-L2 centroid (ties → lower id).
    Centroids ride along as a foldable literal array-of-structs: pure
    projection, no join, no shuffle.

    The literals are single catalyst Literal nodes (fastlit.array_lit)
    rather than k×dim F.lit calls or a parsed named_struct tree — each
    plan analysis re-walks every literal node, and kmeans re-enters
    here every round (same driver-side-cost fix as the SRP plane
    literals in operators.dedup)."""
    from ..functions.fastlit import array_lit

    if not centroids:
        # no codebook (empty corpus): every row — there are none in the
        # only case that produces this from kmeans() — gets NULL.  An
        # empty literal would otherwise type as ARRAY<VOID> and crash
        # the 'cv' extraction at analysis.
        return vectors.withColumn("cluster_id", F.lit(None).cast("int"))
    spark = vectors.sparkSession
    cids = array_lit(spark, [int(cid) for cid, _ in centroids], "array<int>")
    cvs = array_lit(
        spark,
        [[float(v) for v in vec] for _, vec in centroids],
        "array<array<double>>",
    )
    # (d, cid) structs compare lexicographically → array_min IS argmin
    # with the lower-id tie-break, one distance evaluation per centroid;
    # the index-aligned literal pair zips positionally (i = element idx)
    scored = F.transform(
        cvs,
        lambda cv, i: F.struct(
            _sq_dist(F.col(vec_col), cv).alias("d"),
            F.get(cids, i).alias("cid"),
        ),
    )
    return vectors.withColumn("cluster_id", F.array_min(scored)["cid"])


def kmeans(
    vectors: DataFrame,
    k: int = 8,
    rounds: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Lloyd's iterations; returns (assignments DataFrame, centroids).

    Assignments = (id_col, cluster_id).  An empty cluster keeps its
    previous centroid (standard fix; deterministic here).

    Non-finite vectors are excluded (usable_vec, finite-only: one NaN
    component would make its cluster mean NaN and — worse — leak a
    `nan`/`inf` token into the next round's centroid literal, which is
    not parseable SQL).  Zero vectors are fine: squared-L2 assignment
    is well-defined on them.
    """
    from ..functions.vectors import usable_vec

    vectors = vectors.where(
        usable_vec(F.col(vec_col), require_nonzero=False)
    )
    init_rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    centroids = [(i, list(r[vec_col])) for i, r in enumerate(init_rows)]
    assigned = None
    for _ in range(rounds):
        assigned = assign_nearest(vectors, centroids, vec_col)
        means = (
            assigned.select("cluster_id", F.posexplode(F.col(vec_col)))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("col").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        updated = {r["cluster_id"]: list(r["centroid"]) for r in means}
        centroids = [(cid, updated.get(cid, old)) for cid, old in centroids]
    return assigned.select(id_col, "cluster_id"), centroids
