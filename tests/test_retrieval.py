"""BM25 retrieval operator (operators/retrieval.py): scoring parity
with an independent Python reference, the k1/b knob semantics, and the
dirty-input contract (NULL/empty docs can never match)."""

from __future__ import annotations

import math

import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.retrieval import (
    bm25_topk,
)

DOCS = [
    (1, "spark shuffles data across the cluster"),
    (2, "spark spark spark tuning guide"),
    (3, "duckdb runs in process with no cluster"),
    (4, "a very long document about nothing in particular that rambles "
        "on and on and on without saying spark even once more"),
    (5, None),
    (6, ""),
]


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Independent reference implementation (plain Python floats)."""
    toks = {i: (t or "").split() for i, t in docs}
    toks = {i: ts for i, ts in toks.items() if ts}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    out = {}
    for i, ts in toks.items():
        score = 0.0
        for term in terms:
            tf = ts.count(term)
            if not tf:
                continue
            df = sum(1 for other in toks.values() if term in other)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            tfn = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
            score += idf * tfn
        if score:
            out[i] = score
    return out


def _run(spark, queries, **kw):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = spark.createDataFrame(queries, "query string, terms array<string>")
    return bm25_topk(docs, q, **kw).collect()


def test_single_term_matches_reference(spark):
    rows = _run(spark, [("q", ["spark"])], k=10)
    got = {r.doc_id: r.score for r in rows}
    ref = _ref_bm25(DOCS, ["spark"])
    assert set(got) == set(ref)
    for i, s in ref.items():
        assert got[i] == pytest.approx(s, abs=1e-6), i
    # doc 2 (tf=3, short) outranks doc 1 (tf=1) outranks doc 4 (tf=1, long)
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rnk)]
    assert ranked == [2, 1, 4]


def test_multi_term_sums_contributions(spark):
    rows = _run(spark, [("q", ["spark", "cluster"])], k=10)
    got = {r.doc_id: r.score for r in rows}
    ref = _ref_bm25(DOCS, ["spark", "cluster"])
    assert set(got) == set(ref)
    for i, s in ref.items():
        assert got[i] == pytest.approx(s, abs=1e-6), i


def test_b_zero_removes_length_normalization(spark):
    """With b=0 the doc-length term drops out: equal tf ⇒ equal score,
    however long the documents are."""
    rows = _run(spark, [("q", ["cluster"])], k=10, b=0.0)
    scores = {r.doc_id: r.score for r in rows}
    assert scores[1] == scores[3]  # tf=1 each, very different lengths


def test_null_and_empty_docs_never_retrieved(spark):
    rows = _run(spark, [("q", ["spark"]), ("r", ["nonexistent_term"])], k=10)
    assert all(r.doc_id not in (5, 6) for r in rows)
    assert all(r.query == "q" for r in rows)  # no-match query → no rows


def test_rank_ties_break_by_doc_id(spark):
    docs = [(9, "alpha beta"), (2, "alpha beta"), (5, "alpha beta")]
    spark_docs = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(
        [("q", ["alpha"])], "query string, terms array<string>"
    )
    got = sorted(
        (r.rnk, r.doc_id) for r in bm25_topk(spark_docs, q, k=3).collect()
    )
    assert got == [(1, 2), (2, 5), (3, 9)]


def test_streaming_bm25_equals_batch_topk(spark):
    """st11's stream-scored, batch-ranked output must equal the
    one-shot x58 exactly — the frozen-index decomposability contract
    (a doc's scores depend only on its own tokens + the persisted
    artifacts, so micro-batch unions reproduce the batch scoring)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (
        extensions as ext,
    )

    SF = "/root/testdata/sf0.001"
    batch = sorted(tuple(r) for r in ext.x58_bm25_topk(spark, SF).collect())
    streamed = sorted(
        tuple(r) for r in ext.st11_streaming_bm25(spark, SF).collect()
    )
    assert batch == streamed
    assert len(batch) > 0
