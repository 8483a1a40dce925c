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


def test_persisted_index_topk_equals_rebuild(spark, tmp_path):
    """bm25_topk_from_index over a persisted index must equal the
    one-shot rebuild bit-for-bit — including the derived-query path and
    an explicit multi-term query batch (the token-IN pruning must never
    change scores)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.retrieval import (
        bm25_build_index,
        bm25_topk_from_index,
    )

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    path = str(tmp_path / "bm25_index")
    bm25_build_index(docs, path)

    rebuild = sorted(map(tuple, bm25_topk(docs, k=3, top_terms=4).collect()))
    persisted = sorted(
        map(tuple, bm25_topk_from_index(spark, path, k=3, top_terms=4).collect())
    )
    assert persisted == rebuild and rebuild

    queries = spark.createDataFrame(
        [("q_spark_cluster", ["spark", "cluster"]), ("q_duckdb", ["duckdb"])],
        "query string, terms array<string>",
    )
    rebuild_q = sorted(map(tuple, bm25_topk(docs, queries, k=3).collect()))
    persisted_q = sorted(
        map(tuple, bm25_topk_from_index(spark, path, queries, k=3).collect())
    )
    assert persisted_q == rebuild_q and rebuild_q

    # the driver-side pruning-token fast path (x61's shape — tokens
    # already collected) must be result-identical, including a strict
    # SUPERSET token list (extra tokens only widen the scan, the
    # qterms inner join drops them)
    fast_q = sorted(
        map(
            tuple,
            bm25_topk_from_index(
                spark,
                path,
                queries,
                k=3,
                query_tokens=["spark", "cluster", "duckdb"],
            ).collect(),
        )
    )
    assert fast_q == rebuild_q
    superset_q = sorted(
        map(
            tuple,
            bm25_topk_from_index(
                spark,
                path,
                queries,
                k=3,
                query_tokens=["spark", "cluster", "duckdb", "engine", "zzz"],
            ).collect(),
        )
    )
    assert superset_q == rebuild_q


def test_refresh_index_equals_rebuild_over_union(spark, tmp_path):
    """Append-only refresh (delta tf appended, vocab-sized term merge,
    scalar add) must equal a from-scratch index over old ∪ delta."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.retrieval import (
        bm25_build_index,
        bm25_refresh_index,
        bm25_topk_from_index,
        read_bm25_index,
    )

    old = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(
        [
            (7, "fresh spark content about shuffle layout"),
            (8, "an unrelated document concerning ducks"),
            (9, None),
        ],
        "doc_id long, text string",
    )
    inc_path, full_path = str(tmp_path / "inc"), str(tmp_path / "full")
    bm25_build_index(old, inc_path)
    bm25_refresh_index(spark, delta, inc_path)
    bm25_build_index(old.unionByName(delta), full_path)

    for part in ("terms", "scalars"):
        import os

        a = sorted(map(tuple, spark.read.parquet(os.path.join(inc_path, part)).collect()))
        b = sorted(map(tuple, spark.read.parquet(os.path.join(full_path, part)).collect()))
        assert a == b, part
    tf_a, _, _ = read_bm25_index(spark, inc_path)
    tf_b, _, _ = read_bm25_index(spark, full_path)
    assert sorted(map(tuple, tf_a.collect())) == sorted(map(tuple, tf_b.collect()))

    got_inc = sorted(
        map(tuple, bm25_topk_from_index(spark, inc_path, k=4, top_terms=4).collect())
    )
    got_full = sorted(
        map(tuple, bm25_topk_from_index(spark, full_path, k=4, top_terms=4).collect())
    )
    assert got_inc == got_full and got_inc


def test_refresh_index_token_makes_retry_a_noop(spark, tmp_path):
    """A retried refresh with the SAME delta_token must not
    double-append tf or double-count terms/scalars (the failure mode
    the append-only doc-id contract upstream does not cover)."""
    import os

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.retrieval import (
        bm25_build_index,
        bm25_refresh_index,
        read_bm25_index,
    )

    old = spark.createDataFrame(DOCS, "doc_id long, text string")
    delta = spark.createDataFrame(
        [(7, "fresh spark content about shuffle layout")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "inc")
    bm25_build_index(old, path)
    assert bm25_refresh_index(spark, delta, path, delta_token="b1") is True
    snap_tf, snap_terms, snap_scalars = (
        sorted(map(tuple, df.collect())) for df in read_bm25_index(spark, path)
    )
    # retry of an applied token: no-op, returns False, artifacts identical
    assert bm25_refresh_index(spark, delta, path, delta_token="b1") is False
    tf2, terms2, scalars2 = (
        sorted(map(tuple, df.collect())) for df in read_bm25_index(spark, path)
    )
    assert (tf2, terms2, scalars2) == (snap_tf, snap_terms, snap_scalars)
    assert os.path.exists(os.path.join(path, "_applied_deltas", "b1"))


def test_refresh_index_recovers_from_mid_commit_crash(spark, tmp_path):
    """Kill the refresh between phase 1 (staging + intent) and phase 2
    (swaps): the live index is stale-but-consistent, and the next
    refresh call first replays the pending commit, so the final state
    equals a rebuild over the union — no lost delta, no double-append."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators import (
        retrieval as R,
    )

    old = spark.createDataFrame(DOCS, "doc_id long, text string")
    d1 = spark.createDataFrame(
        [(7, "fresh spark content about shuffle layout")],
        "doc_id long, text string",
    )
    d2 = spark.createDataFrame(
        [(8, "an unrelated document concerning ducks")],
        "doc_id long, text string",
    )
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")
    R.bm25_build_index(old, inc_path)

    # simulate the crash: run phase 1 for d1 but die before phase 2
    real_finish = R._finish_refresh_commit
    R._finish_refresh_commit = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash before commit")
    )
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            R.bm25_refresh_index(spark, d1, inc_path, delta_token="d1")
    finally:
        R._finish_refresh_commit = real_finish

    # live index is still the OLD one (nothing swapped)
    n_docs = R.read_bm25_index(spark, inc_path)[2].collect()[0]["n_docs"]
    assert n_docs == 4  # DOCS has 4 non-empty docs

    # next refresh (a different delta) first recovers the pending d1
    assert R.bm25_refresh_index(spark, d2, inc_path, delta_token="d2") is True
    R.bm25_build_index(old.unionByName(d1).unionByName(d2), full_path)
    for part in (0, 1, 2):
        got = sorted(map(tuple, R.read_bm25_index(spark, inc_path)[part].collect()))
        want = sorted(map(tuple, R.read_bm25_index(spark, full_path)[part].collect()))
        assert got == want, ("tf", "terms", "scalars")[part]
    # and a retry of the recovered token is a no-op too
    assert R.bm25_refresh_index(spark, d1, inc_path, delta_token="d1") is False
