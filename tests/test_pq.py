"""Product quantization (operators/pq.py): encode parity against a
numpy reference, training actually reduces reconstruction error, and
ADC top-k holds a recall floor against exact brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
    pq_adc_topk,
    pq_codebooks_init,
    pq_codebooks_train,
    pq_encode,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
    load_table,
)

SF = "/root/testdata/sf0.001"
M, KC = 4, 16


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, "embeddings", SF).select("vec_id", "embedding")


def _np_encode(X, books):
    m = len(books)
    sub = X.shape[1] // m
    codes = np.zeros((len(X), m), dtype=int)
    err = np.zeros(len(X))
    for j, book in enumerate(books):
        C = np.array([v for _, v in book])
        d = ((X[:, j * sub : (j + 1) * sub][:, None, :] - C[None]) ** 2).sum(
            axis=2
        )
        codes[:, j] = d.argmin(axis=1)  # first min = lower code on ties
        err += d.min(axis=1)
    return codes, err


def test_encode_matches_numpy_reference(spark, emb):
    books = pq_codebooks_init(emb, m=M, k=KC)
    got = {r.vec_id: r for r in pq_encode(emb, books).collect()}
    rows = emb.collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    codes, err = _np_encode(X, books)
    for i, r in enumerate(rows):
        g = got[r.vec_id]
        assert [g.code_0, g.code_1, g.code_2, g.code_3] == list(codes[i])
        assert g.recon_sq == pytest.approx(err[i], abs=2e-6)


def test_training_reduces_reconstruction_error(spark, emb):
    init_books = pq_codebooks_init(emb, m=M, k=KC)
    trained = pq_codebooks_train(emb, m=M, k=KC, rounds=3)
    e_init = pq_encode(emb, init_books).agg(F.sum("recon_sq")).first()[0]
    e_trained = pq_encode(emb, trained).agg(F.sum("recon_sq")).first()[0]
    assert e_trained < e_init * 0.9  # Lloyd's must buy a real reduction


def test_adc_recall_against_brute_force(spark, emb):
    """recall@5 of ADC top-5 vs exact squared-L2 top-5 with TRAINED
    codebooks (8 subspaces × 16 codes = 32 bits/vector).  Isotropic
    64-dim vectors are the worst case for quantization (the same
    caveat as the IVF recall pin in README.md) — measured 0.20 here vs
    a random baseline of 5/500 = 0.01; the floor pins 'much better
    than random', not near-exact, with slack for fixture
    regeneration."""
    trained = pq_codebooks_train(emb, m=8, k=KC, rounds=3)
    codes = pq_encode(emb, trained)
    queries = emb.where(F.col("vec_id") < 8)
    got = pq_adc_topk(codes, trained, queries, k=5).collect()
    adc = {}
    for r in got:
        adc.setdefault(r.query_id, set()).add(r.cand_id)

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    recalls = []
    for q in sorted(adc):
        qv = X[ids == q][0]
        d = ((X - qv) ** 2).sum(axis=1)
        d[ids == q] = np.inf  # exclude self, as the operator does
        exact = set(ids[np.argsort(d, kind="stable")[:5]])
        recalls.append(len(adc[q] & exact) / 5)
    assert len(recalls) == 8
    assert float(np.mean(recalls)) >= 0.15


def test_adc_excludes_self_and_ranks_ascending(spark, emb):
    books = pq_codebooks_init(emb, m=M, k=KC)
    codes = pq_encode(emb, books)
    queries = emb.where(F.col("vec_id") < 3)
    out = pq_adc_topk(codes, books, queries, k=5).collect()
    for r in out:
        assert r.query_id != r.cand_id
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.approx_d2, r.cand_id))
    for q, rs in by_q.items():
        rs.sort()
        ds = [d for _, d, _ in rs]
        assert ds == sorted(ds), q


def test_trained_codebooks_empty_corpus_contract(spark, emb):
    """pq_codebooks_train on an empty / all-NULL corpus returns m empty
    books (the pq_codebooks_init contract), and pq_encode of those is
    the typed NULL-coded frame — not a TypeError on first()."""
    empty = emb.where(F.lit(False))
    books = pq_codebooks_train(empty, m=M, k=KC)
    assert books == [[] for _ in range(M)]
    nulled = emb.select("vec_id", F.lit(None).cast("array<double>").alias("embedding"))
    books2 = pq_codebooks_train(nulled, m=M, k=KC)
    assert books2 == [[] for _ in range(M)]
    out = pq_encode(emb.limit(3), books)
    assert out.count() == 3
    for r in out.collect():
        assert r.code_0 is None and r.recon_sq is None


def test_indivisible_dim_raises(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_init(emb, m=5, k=KC)
    with pytest.raises(ValueError, match="not divisible"):
        pq_codebooks_train(emb, m=5, k=KC)


def test_ivf_pq_recall_against_brute_force(spark, spark_sf01_emb=None):
    """recall@5 of IVF-pruned ADC (nprobe=2 of ~40 L2 cells, trained
    8×16 codebooks) vs exact squared-L2 top-5 at sf0.1.  Measured 0.225
    vs a random baseline of 5/2000 = 0.0025; the floor pins 'much
    better than random' with slack (isotropic vectors are PQ's worst
    case — the same caveat as the flat-ADC and IVF recall pins)."""
    import math

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
        usable_vec,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_topk,
    )

    emb01 = (
        load_table(spark, "embeddings", "/root/testdata/sf0.1")
        .where(usable_vec(F.col("embedding"), require_nonzero=False))
        .select("vec_id", "embedding")
    )
    n = emb01.count()
    stride = max(50, math.ceil(n / 100))
    cents = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in emb01.where(F.col("vec_id") % stride == 3).collect()
    ]
    books = pq_codebooks_train(emb01, m=8, k=16, rounds=3)
    queries = emb01.where(F.col("vec_id") < 8)
    got = ivf_pq_topk(emb01, queries, cents, books, k=5, nprobe=2).collect()
    adc = {}
    for r in got:
        adc.setdefault(r.query_id, set()).add(r.cand_id)

    rows = emb01.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    recalls = []
    for q in sorted(adc):
        qv = X[ids == q][0]
        d = ((X - qv) ** 2).sum(axis=1)
        d[ids == q] = np.inf
        exact = set(ids[np.argsort(d, kind="stable")[:5]])
        recalls.append(len(adc[q] & exact) / 5)
    assert len(recalls) == 8
    assert float(np.mean(recalls)) >= 0.15


def test_ivf_pq_empty_and_rank_contracts(spark, emb):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_topk,
    )

    out = ivf_pq_topk(emb, emb.limit(2), [], [[] for _ in range(M)], k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "cand_id", "adc_d2", "rnk"]

    cents = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    books = pq_codebooks_init(emb, m=M, k=KC)
    got = ivf_pq_topk(emb, emb.where(F.col("vec_id") < 3), cents, books, k=5)
    by_q = {}
    for r in got.collect():
        assert r.query_id != r.cand_id
        by_q.setdefault(r.query_id, []).append((r.rnk, r.adc_d2))
    for q, rs in by_q.items():
        rs.sort()
        assert [d for _, d in rs] == sorted(d for _, d in rs), q


def test_ivf_pq_residual_matches_numpy_reference(spark, emb):
    """IVFADC residual path (encode v − centroid(v), score
    ||q − (centroid + recon(residual))||²) against a plain-numpy
    reference, exact to rounding.  Recall superiority is deliberately
    NOT asserted: on the isotropic fixture residuals have ~2× the raw
    variance (nearest of the random centroids is nearly orthogonal), so
    residual recall measures 0.100 vs 0.225 raw at sf0.1 — documented
    in the operator docstring; residual encoding pays off on clustered
    production embeddings, and this test pins that the arithmetic is
    right so that claim is testable there."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_topk,
        ivf_residuals,
    )

    cents = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    res_books = pq_codebooks_init(ivf_residuals(emb, cents), m=M, k=KC)
    queries = emb.where(F.col("vec_id") < 3)
    got = {
        (r.query_id, r.cand_id): r.adc_d2
        for r in ivf_pq_topk(
            emb, queries, cents, res_books, k=5, nprobe=2, residual=True
        ).collect()
    }
    assert got

    rows = emb.collect()
    ids = [r.vec_id for r in rows]
    X = {r.vec_id: np.array(list(r.embedding), dtype=np.float64) for r in rows}
    C = {cid: np.array(v) for cid, v in cents}

    def cell_of(v):
        ds = [(float(((v - c) ** 2).sum()), cid) for cid, c in C.items()]
        return min(ds)[1]

    resid = {i: X[i] - C[cell_of(X[i])] for i in ids}
    books = [
        np.array([bv for _, bv in res_books[j]]) for j in range(M)
    ]
    sub = 64 // M

    def recon(i):
        out = []
        for j in range(M):
            sl = resid[i][j * sub : (j + 1) * sub]
            d = ((books[j] - sl) ** 2).sum(axis=1)
            out.append(books[j][int(d.argmin())])
        return np.concatenate(out)

    for (q, cand), adc in got.items():
        approx = C[cell_of(X[cand])] + recon(cand)
        expect = float(((X[q] - approx) ** 2).sum())
        assert adc == pytest.approx(expect, abs=2e-6), (q, cand)


def test_streaming_ivf_pq_equals_batch(spark, emb, tmp_path):
    """Stream-encoded codes (3 micro-batches against frozen centroids +
    codebooks) ranked once must equal the one-shot ivf_pq_topk
    bit-for-bit — encoding is a pure per-row function of (vector,
    frozen codebooks), the st12 contract."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_topk,
        ivf_pq_topk_from_codes,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        streaming_ivf_pq_encode,
    )

    cents = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    books = pq_codebooks_init(emb, m=M, k=KC)
    queries = emb.where(F.col("vec_id") < 3)

    batch = sorted(
        map(tuple, ivf_pq_topk(emb, queries, cents, books, k=5).collect())
    )

    emb.repartition(3).write.parquet(str(tmp_path / "batch"))
    streaming_ivf_pq_encode(
        spark,
        str(tmp_path / "batch"),
        cents,
        books,
        str(tmp_path / "codes"),
        str(tmp_path / "ckpt"),
    )
    streamed = sorted(
        map(
            tuple,
            ivf_pq_topk_from_codes(
                spark.read.parquet(str(tmp_path / "codes")),
                queries,
                cents,
                books,
                k=5,
            ).collect(),
        )
    )
    assert streamed == batch and batch


def test_ivf_pq_recall_on_clustered_fixture(spark):
    """The production-grade recall pin the isotropic fixtures can't
    give (r7 verdict #1): on planted ELONGATED clusters
    (sources/synthetic.clustered_embeddings — members straddle cell
    boundaries, ids shuffled so tie-breaks can't fake recall):

    - trained IVF (32 cells) × residual PQ (m=16, k=64) at nprobe=2
      reaches recall@5 ≥ 0.8 vs exact brute force (measured 0.925);
    - recall RISES from nprobe=1 (cell coverage is a real constraint
      there: ceiling 0.825, measured 0.775 → 0.925 at nprobe=2);
    - at the TIGHT code budget (m=8 — half the bits) residual (IVFADC)
      encoding clearly beats raw-vector books (measured 0.838 vs
      0.675; at m=16 the gap narrows to 0.925 vs 0.887 — the advantage
      GROWS as the budget tightens, because raw books must spend codes
      memorizing the 16 cluster centers while residual books spend
      everything on within-cell position).  This is the
      operators/pq.py clustered-data claim, previously untestable on
      isotropic fixtures.  tools/recall_probe.py prints the full
      recall-vs-nprobe table for both budgets (recorded in SCALE.md).
    """
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.clustering import (
        kmeans,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_topk,
        ivf_residuals,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.synthetic import (
        cluster_center_queries,
        clustered_embeddings,
    )

    centers, full = clustered_embeddings(spark, per_cluster=32)
    corpus = full.select("vec_id", "embedding").cache()
    queries = cluster_center_queries(spark, centers, n_queries=16)
    rows = corpus.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows])
    exact = {}
    for qr in queries.collect():
        qv = np.array(list(qr.embedding))
        d = ((X - qv) ** 2).sum(axis=1)
        exact[qr.vec_id] = set(ids[np.argsort(d, kind="stable")[:5]])

    _, cents = kmeans(corpus, k=32, rounds=3)
    residuals = ivf_residuals(corpus, cents)

    def recall(books, nprobe, residual):
        got = ivf_pq_topk(
            corpus, queries, cents, books, k=5, nprobe=nprobe,
            residual=residual,
        ).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r.query_id, set()).add(r.cand_id)
        return float(
            np.mean([len(by_q.get(q, set()) & exact[q]) / 5 for q in exact])
        )

    books_res16 = pq_codebooks_train(residuals, m=16, k=64, rounds=3)
    res16_np1 = recall(books_res16, 1, True)
    res16_np2 = recall(books_res16, 2, True)
    assert res16_np2 >= 0.8, res16_np2      # production-grade floor
    assert res16_np2 >= res16_np1, (res16_np1, res16_np2)  # curve rises

    books_res8 = pq_codebooks_train(residuals, m=8, k=64, rounds=3)
    books_raw8 = pq_codebooks_train(corpus, m=8, k=64, rounds=3)
    res8 = recall(books_res8, 2, True)
    raw8 = recall(books_raw8, 2, False)
    corpus.unpersist()
    assert res8 >= raw8 + 0.1, (raw8, res8)  # IVFADC claim, tight budget


def test_persisted_index_equals_in_memory(spark, emb, tmp_path):
    """x65's operator contract: (build index → score from persisted
    artifact) must equal scoring straight from the in-memory model —
    the persistence round-trip (codes layout, centroid/codebook
    tables, meta) loses nothing.  Also pins the scan-pruning claim:
    the pruned plan reads only probed cells yet returns identical
    rows, and the codes scan carries a pushed In(__cell, ...) filter."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_build_index,
        ivf_pq_topk,
        ivf_pq_topk_from_persisted,
        read_ivf_pq_index,
    )

    cents = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in emb.orderBy("vec_id").limit(6).collect()
    ]
    books = pq_codebooks_init(emb, m=M, k=KC)
    root = str(tmp_path / "ivfpq")
    ivf_pq_build_index(emb, cents, books, root)

    # round-trip: the model tables come back exactly
    _codes, cents2, books2, residual = read_ivf_pq_index(spark, root)
    assert cents2 == [(c, [float(v) for v in vec]) for c, vec in cents]
    assert books2 == books and residual is False

    queries = emb.orderBy(F.col("vec_id").asc()).limit(4)
    want = sorted(
        map(tuple, ivf_pq_topk(emb, queries, cents, books, k=5).collect())
    )
    frame = ivf_pq_topk_from_persisted(spark, root, queries, k=5)
    got = sorted(map(tuple, frame.collect()))
    assert got == want and len(got) > 0

    plan = frame._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(__cell" in plan


def test_persisted_index_residual_flag_round_trips(spark, emb, tmp_path):
    """The meta table must carry the residual flag so a scorer can't
    silently mis-score a residual-encoded index as raw."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_build_index,
        ivf_pq_topk,
        ivf_pq_topk_from_persisted,
        ivf_residuals,
        pq_codebooks_train,
    )

    cents = [
        (r.vec_id, [float(v) for v in r.embedding])
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    books = pq_codebooks_train(
        ivf_residuals(emb, cents), m=M, k=8, rounds=1
    )
    root = str(tmp_path / "ivfpq_res")
    ivf_pq_build_index(emb, cents, books, root, residual=True)
    queries = emb.orderBy(F.col("vec_id").asc()).limit(3)
    want = sorted(
        map(
            tuple,
            ivf_pq_topk(
                emb, queries, cents, books, k=4, residual=True
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            ivf_pq_topk_from_persisted(
                spark, root, queries, k=4
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


def test_py_probe_cells_matches_query_probes(spark, emb):
    """The driver-side probed-cell mirror (py_probe_cells — the x65/x67
    collect-job elimination) must equal the collected _query_probes set
    BIT-FOR-BIT: fixture vectors, tie-heavy synthetic vectors, and the
    usable_vec gate cases (NULL vector / NULL component / NaN / inf
    excluded, empty kept)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        _query_probes,
        py_probe_cells,
    )

    def spark_cells(qdf, cents, nprobe):
        return sorted(
            {
                r["__cell"]
                for r in _query_probes(
                    qdf, cents, nprobe, "embedding", "vec_id"
                )
                .select("__cell")
                .distinct()
                .collect()
            }
        )

    # fixture: stride centroids, several query slices, both nprobes
    rows = emb.orderBy("vec_id").collect()
    cents = [
        (r.vec_id, [float(v) for v in r.embedding]) for r in rows[::7][:12]
    ]
    for lo, hi in ((0, 5), (5, 25), (30, 60)):
        qdf = emb.where(
            (F.col("vec_id") >= rows[lo].vec_id)
            & (F.col("vec_id") <= rows[hi - 1].vec_id)
        )
        for nprobe in (1, 2, 3):
            assert py_probe_cells(rows[lo:hi], cents, nprobe) == spark_cells(
                qdf, cents, nprobe
            )

    # adversarial: exact ties (distance-equal centroids -> lower cid),
    # subnormal/huge magnitudes, and the usable gate
    bad = float("nan")
    inf = float("inf")
    synth = [
        (1, [0.0, 0.0]),            # tie between cents 10 and 11
        (2, [1e300, -1e300]),       # inf fold JVM-side too
        (3, [5e-324, 0.0]),         # subnormal
        (4, None),                  # NULL vector -> skipped
        (5, [None, 1.0]),           # NULL component -> skipped
        (6, [bad, 1.0]),            # NaN -> skipped
        (7, [inf, 1.0]),            # inf component -> skipped
        (8, [0.25, -0.75]),
    ]
    syn_cents = [
        (10, [1.0, 0.0]),
        (11, [0.0, 1.0]),           # same distance to [0,0] as cid 10
        (12, [-1.0, 0.5]),
        (13, [1e300, -1e300]),
    ]
    qdf = spark.createDataFrame(
        synth, "vec_id long, embedding array<double>"
    )
    syn_rows = qdf.collect()
    for nprobe in (1, 2, 3):
        assert py_probe_cells(syn_rows, syn_cents, nprobe) == spark_cells(
            qdf, syn_cents, nprobe
        )
