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
from ..functions.vectors import usable_vec, cosine_staged, norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Ties break on candidate id (ascending) so results are deterministic
    and oracle-comparable.  Self-matches (same id) are excluded.  Norms
    are staged once per vector (cosine_staged), so each of the q × n
    score rows does a single dot-product aggregation.

    Only usable vectors participate on either side (finite components,
    nonzero norm — functions.vectors.usable_vec); see
    embedding_near_dup_pairs for why.
    """
    corpus = corpus.where(usable_vec(F.col(vec_col)))
    queries = queries.where(usable_vec(F.col(vec_col)))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos",
            round_fixed(
                cosine_staged(
                    F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ),
        )
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
    ROW_NUMBER(ORDER BY score DESC, id ASC) formulation.  The shuffle is
    keyed on ``id_col`` only — the embedding rides as an aggregated
    payload (every row of an id group carries the identical vector), so
    the wide array never becomes a shuffle key.  Norms are staged once
    per vector/centroid."""
    cent = centroids.select(
        F.col(centroid_id),
        F.col(centroid_vec).alias("__cv"),
        norm(F.col(centroid_vec)).alias("__cn"),
    )
    staged = corpus.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__vn")
    )
    scored = staged.join(F.broadcast(cent)).withColumn(
        "__score",
        round_fixed(
            cosine_staged(
                F.col(vec_col), F.col("__cv"), F.col("__vn"), F.col("__cn")
            ),
            6,
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.first(vec_col).alias(vec_col),
            F.max_by(
                F.col(centroid_id),
                F.struct(
                    F.col("__score").alias("s"),
                    (-F.col(centroid_id)).alias("t"),
                ),
            ).alias("cell"),
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
    brute_force_topk to report recall@k.

    Only usable vectors participate (finite, nonzero — usable_vec); the
    centroid table is assumed clean (it is derived from a filtered
    corpus)."""
    corpus = corpus.where(usable_vec(F.col(vec_col)))
    queries = queries.where(usable_vec(F.col(vec_col)))
    cells = assign_cells(corpus, centroids, vec_col, id_col, centroid_id, centroid_vec)
    cent = centroids.select(
        F.col(centroid_id),
        F.col(centroid_vec).alias("__cv"),
        norm(F.col(centroid_vec)).alias("__ccn"),
    )
    q_staged = queries.select(
        F.col(id_col), F.col(vec_col), norm(F.col(vec_col)).alias("__qn")
    )
    q_scored = q_staged.join(F.broadcast(cent)).withColumn(
        "__score",
        round_fixed(
            cosine_staged(
                F.col(vec_col), F.col("__cv"), F.col("__qn"), F.col("__ccn")
            ),
            6,
        ),
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
            F.col("__qn"),
            F.col(centroid_id).alias("cell"),
        )
    )
    cand = cells.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("__cn"),
        "cell",
    )
    scored = (
        cand.join(F.broadcast(q_cells), "cell")
        .where(F.col("query_id") != F.col("cand_id"))
        .withColumn(
            "cos",
            round_fixed(
                cosine_staged(
                    F.col("qv"), F.col("cv"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos", "rank")
    )
