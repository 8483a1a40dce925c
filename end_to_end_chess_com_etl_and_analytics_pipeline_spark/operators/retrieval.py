"""BM25 lexical retrieval: top-k documents per query.

The LLM-data-pipeline use case is retrieval-shaped selection: given
query terms (seed prompts, benchmark probes, topic keywords), pull the
k most relevant documents from the corpus — the lexical complement to
the embedding ANN path (operators/similarity.py).  The reference has no
retrieval surface; this is a north-star extension next to tf-idf
(plans/extensions.py::x19), which scores terms *within* a document
while BM25 ranks documents *against* a query.

Scoring is Okapi BM25 with the Lucene idf form:

    idf(t)    = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t, d) = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    score(q, d) = Σ_{t ∈ q} idf(t)·tfn(t, d)

Scale shape (the inverted-index plan):

- the corpus is tokenized and aggregated to the (doc, term, tf) table
  with ONE shuffle — the same exchange an inverted index build pays;
  dl and df are windows over that collapsed table, so no second scan.
- corpus statistics (N, Σdl) are a 1-row aggregate broadcast back via
  crossJoin — never a driver collect.
- the query side is broadcast (a query set is small by definition), so
  scoring is a map-side hash join against the term table: the corpus
  shuffles once no matter how many queries probe it.
- the only per-query exchange is the final top-k window, over
  |matched terms| rows, not the corpus.

Cross-engine determinism: every arithmetic step is written with the
same IEEE-double expression shape the DuckDB oracle uses (explicit
double casts, one division order), the final score is round_fixed to 6
decimals (the cosine contract), and ranking tie-breaks on doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed
from ..functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    terms_col: str = "terms",
    top_terms: int = 8,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` is ``(query_col, terms_col: array<string>)``; multi-term
    queries sum their per-term contributions.  ``queries=None`` derives
    single-term queries from the corpus itself — the ``top_terms``
    globally most frequent tokens (total occurrences desc, token asc) —
    straight from the already-built tf table, so the corpus is
    tokenized exactly once.  Returns ``(query_col, id_col, score,
    rnk)`` with ``rnk`` 1-based and ties broken by ascending document
    id.  Documents with no tokens can never match and are excluded from
    the corpus statistics (they have no length to normalize by).
    """
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    # dl is computed AT THE SCAN (array size) and carried through the
    # explode, so the only exchanges the index build pays are the tf
    # aggregation and the df window — a dl window over the collapsed
    # table would be a third full shuffle for a value the scan already
    # knows.  min(dl) in the agg is a constant per doc (any row of the
    # group carries the same size).
    exploded = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("dl"),
        F.explode(toks).alias("token"),
    )
    tf = exploded.groupBy(id_col, "token").agg(
        F.count("*").alias("tf"), F.min("dl").alias("dl")
    )
    enriched = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("token"))
    )
    scalars = tf.groupBy().agg(
        F.sum("tf").alias("sum_dl"),
        F.countDistinct(id_col).alias("n_docs"),
    )
    enriched = enriched.crossJoin(F.broadcast(scalars))
    if queries is None:
        qterms = (
            tf.groupBy("token")
            .agg(F.sum("tf").alias("__cnt"))
            .orderBy(F.col("__cnt").desc(), F.col("token").asc())
            .limit(top_terms)
            .select(F.col("token").alias(query_col), "token")
        )
    else:
        qterms = queries.select(
            F.col(query_col), F.explode(F.col(terms_col)).alias("token")
        )
    joined = enriched.join(F.broadcast(qterms), "token")
    # expression shapes mirror the oracle SQL exactly (one division
    # order, double literals) — see module docstring
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    rel_len = F.col("dl") / (
        F.col("sum_dl").cast("double") / F.col("n_docs")
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * rel_len)
    )
    scored = joined.select(
        query_col, id_col, (idf * tfn).alias("__term_score")
    )
    agg = scored.groupBy(query_col, id_col).agg(
        round_fixed(F.sum("__term_score"), 6).alias("score")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select(query_col, id_col, "score", "rnk")
    )
