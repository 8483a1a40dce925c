"""Similarity search over embedding columns.

Two tiers:

- ``brute_force_topk``: exact cosine top-k — broadcast the (small) query
  set against the full corpus; one pass over the corpus, per-partition
  partial top-k via window rank after AQE-coalesced shuffle on query id.
  This is the correctness baseline and is already the right plan when
  |queries| is small: the corpus is never shuffled, only the (q × n)
  score rows.
- ``ivf_topk``: IVF-style approximate search — assign every vector to
  its nearest coarse centroid (broadcast centroids), then search only
  the cells the query maps to (``nprobe`` nearest cells).  At 100 TB
  this turns a full-corpus scan per query into a scan of ~nprobe/k of
  the data, and the cell assignment is a one-off, cacheable projection.

No Python in the scoring path: cosine is zip_with/aggregate (codegen'd).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed
from ..functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Ties break on candidate id (ascending) so results are deterministic
    and oracle-comparable.  Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", round_fixed(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """IVF cell assignment: nearest centroid by cosine (broadcast join +
    max_by — one corpus pass, one shuffle keyed on the corpus id).

    The assignment score is rounded to 6 decimals and ties break on the
    lower centroid id (max_by over a (score, -id) struct), so the
    assignment is deterministic and reproducible by the DuckDB oracle's
    ROW_NUMBER(ORDER BY score DESC, id ASC) formulation."""
    cent = centroids.select(
        F.col(centroid_id), F.col(centroid_vec).alias("__cv")
    )
    scored = corpus.join(F.broadcast(cent)).withColumn(
        "__score", round_fixed(cosine(F.col(vec_col), F.col("__cv")), 6)
    )
    return (
        scored.groupBy(id_col, vec_col)
        .agg(
            F.max_by(
                F.col(centroid_id),
                F.struct(
                    F.col("__score").alias("s"),
                    (-F.col(centroid_id)).alias("t"),
                ),
            ).alias("cell")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid",
) -> DataFrame:
    """Approximate top-k: search only the ``nprobe`` cells nearest each
    query.  Recall < 1.0 by design; the bench pairs it with
    brute_force_topk to report recall@k."""
    cells = assign_cells(corpus, centroids, vec_col, id_col, centroid_id, centroid_vec)
    cent = centroids.select(F.col(centroid_id), F.col(centroid_vec).alias("__cv"))
    q_scored = queries.join(F.broadcast(cent)).withColumn(
        "__score", round_fixed(cosine(F.col(vec_col), F.col("__cv")), 6)
    )
    wq = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col(centroid_id).asc()
    )
    q_cells = (
        q_scored.withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.col(centroid_id).alias("cell"),
        )
    )
    cand = cells.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"), "cell"
    )
    scored = (
        cand.join(F.broadcast(q_cells), "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn("cos", round_fixed(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )
