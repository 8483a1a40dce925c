"""session.cached_column: the per-session expression memo must return
the SAME tree for the same key (that is the point — zero rebuild
cost), distinct trees for distinct keys, and a cached MinHash
signature tree must produce values identical to a freshly-built,
uncached one (the memo caches expression structure, never data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark import session as S
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
    minhash_signature_array,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
    cached_column,
)


def test_same_key_returns_same_tree(spark):
    calls = []

    def build():
        calls.append(1)
        return F.col("x") + F.lit(1)

    c1 = cached_column(spark, ("t", 1), build)
    c2 = cached_column(spark, ("t", 1), build)
    assert c1 is c2
    assert len(calls) == 1
    c3 = cached_column(spark, ("t", 2), build)
    assert c3 is not c1
    assert len(calls) == 2


def test_cached_tree_reused_across_plans(spark):
    col = cached_column(
        spark, ("t3",), lambda: (F.col("x") * F.lit(2)).alias("y")
    )
    a = spark.createDataFrame([(1,), (2,)], "x int").select(col)
    b = spark.createDataFrame([(5,)], "x int").select(col)
    assert sorted(r["y"] for r in a.collect()) == [2, 4]
    assert [r["y"] for r in b.collect()] == [10]


def test_minhash_signature_cached_equals_fresh(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "c d e f g"), (3, None)],
        "doc_id long, text string",
    )
    # first call populates the memo, second call reuses it — both must
    # equal a build that bypasses the memo entirely
    cached1 = minhash_signature_array(docs).collect()
    cached2 = minhash_signature_array(docs).collect()
    per_session = S._EXPR_CACHE[spark]
    saved = {k: per_session.pop(k) for k in list(per_session)}
    try:
        fresh = minhash_signature_array(docs).collect()
    finally:
        per_session.update(saved)
    key = lambda rows: sorted(  # noqa: E731
        (r["doc_id"], list(r["signature"])) for r in rows
    )
    assert key(cached1) == key(cached2) == key(fresh)
