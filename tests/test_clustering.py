"""k-means differential test (operators/clustering.py vs numpy Lloyd's)
and plan-shape assertions for the newer driver queries."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.clustering import (
    assign_nearest,
    kmeans,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
    load_table,
)

from .conftest import SF_DIR


def _numpy_lloyds(X, ids, k, rounds):
    order = np.argsort(ids)
    cent = X[order[:k]].astype(np.float64).copy()
    assign = None
    for _ in range(rounds):
        # argmin squared-L2; np.argmin takes the first (lowest cid) on ties
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return assign, cent


def test_kmeans_matches_numpy(spark):
    emb = load_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)

    assigned, centroids = kmeans(emb, k=8, rounds=3)
    got = {r.vec_id: r.cluster_id for r in assigned.collect()}

    np_assign, np_cent = _numpy_lloyds(X, ids, k=8, rounds=3)
    want = {int(i): int(a) for i, a in zip(ids, np_assign)}

    # assignments agree except where a vector is numerically equidistant
    diff = [i for i in want if want[i] != got[i]]
    assert len(diff) <= max(1, len(want) // 100), diff[:10]
    # centroids agree to float tolerance
    got_cent = np.array([c for _, c in sorted(centroids)])
    assert np.allclose(got_cent, np_cent, atol=1e-8)


def test_assign_nearest_is_shuffle_free(spark):
    # spread=False isolates the operator's own plan: the adaptive
    # small-scan spread adds a round-robin exchange at the SCAN stage,
    # which is not what this contract is about.
    emb = load_table(spark, "embeddings", SF_DIR, spread=False)
    plan = (
        assign_nearest(emb, [(0, [0.0] * 64), (1, [1.0] * 64)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_new_query_plan_shapes(spark):
    """The plans we designed are the plans that run: broadcast where a
    side is small, a single key shuffle where one suffices."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    # x19 tf-idf: no join at all — df is a window over the collapsed tf
    # table, so the exploded corpus is shuffled exactly once and the two
    # window shuffles move only distinct (doc, token) rows
    plan = (
        suites.FULL_QUERIES["x19_tfidf_topk"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 3, plan

    # q15 group top-k: exactly one hash-partition exchange (the window)
    plan = (
        suites.FULL_QUERIES["q15_group_topk"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan

    # q14 rollup: Expand feeding ONE aggregation shuffle
    plan = (
        suites.FULL_QUERIES["q14_rollup"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan

    # x18 hash split: pure projection over the scan — no exchange at all
    plan = (
        suites.FULL_QUERIES["x18_hash_split"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_assign_cells_vectorized_matches_expression(spark):
    """The BLAS assignment (mapInPandas matmul) must be row-identical
    to the expression formulation — same rounded-cosine scores, same
    lower-id tie-break — on both the fixture corpus and a random one
    (different dim, denser codebook)."""
    import random

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
        usable_vec,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.similarity import (
        assign_cells,
        assign_cells_vectorized,
    )

    def check(emb, centroids):
        expr = {
            r["vec_id"]: r["cell"]
            for r in assign_cells(emb, centroids).collect()
        }
        blas = {
            r["vec_id"]: r["cell"]
            for r in assign_cells_vectorized(emb, centroids).collect()
        }
        assert blas == expr and len(blas) > 0

    emb = load_table(spark, "embeddings", SF_DIR).where(
        usable_vec(F.col("embedding"))
    )
    check(
        emb,
        emb.where(F.col("vec_id") % 50 == 3).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        ),
    )
    rng = random.Random(4312)
    rand = spark.createDataFrame(
        [
            (i, [rng.uniform(-1.0, 1.0) for _ in range(8)])
            for i in range(2000)
        ],
        "vec_id long, embedding array<float>",
    ).repartition(7)
    check(
        rand,
        rand.where(F.col("vec_id") % 13 == 3).select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        ),
    )


def test_ivf_fused_matches_joined(spark):
    """The fused single-pass ivf_topk must be row-identical to the
    declarative join formulation on the fixture corpus."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_joined,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") < 40)
    centroids = emb.where(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    for nprobe in (1, 2, 3):
        fused = sorted(
            map(tuple, ivf_topk(emb, queries, centroids, k=5, nprobe=nprobe).collect())
        )
        joined = sorted(
            map(
                tuple,
                ivf_topk_joined(
                    emb, queries, centroids, k=5, nprobe=nprobe
                ).collect(),
            )
        )
        assert fused == joined and len(fused) > 0


def test_semantic_dedup_in_cells_matches_join_formulation(spark):
    """The blocked-BLAS keep-first kernel must be row-identical to the
    declarative pair-join formulation (the shape the DuckDB oracle
    mirrors), including at a block size smaller than the cell so the
    tiling seams are exercised."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.rounding import (
        round_fixed,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
        cosine_staged,
        norm,
        usable_vec,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators import (
        similarity as S,
    )

    emb = load_table(spark, "embeddings", SF_DIR).where(
        usable_vec(F.col("embedding"))
    )
    centroids = emb.where(F.col("vec_id") % 23 == 3).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    cells = S.assign_cells_vectorized(emb, centroids)
    threshold = 0.4  # low enough that real dups exist on the fixture

    staged = cells.select(
        "vec_id", "cell", "embedding", norm(F.col("embedding")).alias("__n")
    ).localCheckpoint(eager=False)
    a = staged.select(
        F.col("vec_id").alias("a_id"), "cell",
        F.col("embedding").alias("__va"), F.col("__n").alias("__na"),
    )
    b = staged.select(
        F.col("vec_id").alias("b_id"), "cell",
        F.col("embedding").alias("__vb"), F.col("__n").alias("__nb"),
    )
    dup_ids = {
        r["a_id"]
        for r in a.join(b, "cell")
        .where(F.col("b_id") < F.col("a_id"))
        .where(
            round_fixed(
                cosine_staged(
                    F.col("__va"), F.col("__vb"),
                    F.col("__na"), F.col("__nb"),
                ),
                6,
            )
            >= threshold
        )
        .select("a_id")
        .distinct()
        .collect()
    }
    assert dup_ids  # the threshold must actually mark duplicates

    for block in (7, 4096):
        got = {
            r["vec_id"]: r["keep_semantic"]
            for r in S.semantic_dedup_in_cells(
                cells, threshold, block=block
            ).collect()
        }
        assert len(got) == staged.count()
        assert {v for v, keep in got.items() if not keep} == dup_ids


def test_ivf_recall_at_5_vs_brute_force(spark):
    """Recall@5 of IVF vs exact brute force on the embeddings fixture
    (40 queries, 500 64-dim isotropic random vectors — a worst case for
    cell partitioning, since true neighbors spread across cells).  Pins
    the three claims that matter: (a) k-means-trained centroids beat
    arbitrary ones at equal nprobe, (b) recall rises monotonically with
    nprobe (the advertised knob), (c) trained nprobe=4/8 recall >= 0.75.
    Observed values are recorded in README.md."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.where(F.col("vec_id") < 40)
    exact = {
        (r.query_id, r.cand_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(centroids, nprobe):
        approx = {
            (r.query_id, r.cand_id)
            for r in ivf_topk(emb, queries, centroids, k=5, nprobe=nprobe).collect()
        }
        return len(exact & approx) / len(exact)

    arbitrary = emb.where(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    _, cents = kmeans(emb, k=8, rounds=5)
    trained = spark.createDataFrame(
        [(int(c), [float(x) for x in v]) for c, v in cents],
        "centroid_id: int, centroid: array<double>",
    )

    r_arb = recall(arbitrary, 2)
    r2, r3, r4 = recall(trained, 2), recall(trained, 3), recall(trained, 4)
    print(f"recall@5: arbitrary/np2={r_arb:.3f} trained np2={r2:.3f} "
          f"np3={r3:.3f} np4={r4:.3f}")
    assert r2 > r_arb            # training the cells helps
    assert r2 <= r3 <= r4        # nprobe is a monotone recall knob
    assert r4 >= 0.75            # pinned floor (observed 0.795)


def test_x12_stride_parity_at_non_fixture_size(spark, tmp_path):
    """x12's IVF codebook stride (max(50, ceil(n/100))) must be the
    SAME arithmetic in the Spark query and the DuckDB oracle — at a
    corpus size neither fixture has, so formula drift can't hide
    behind the fixtures' round sizes (5613 → stride 57; the fixtures
    exercise only the floor-50 branch at sf0.01 and the exact 50 at
    sf0.1)."""
    import duckdb
    import math
    import random

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (
        extensions as E,
    )
    from tests.oracle_compare import compare

    n, dim = 5613, 8
    rng = random.Random(712)
    rows = [
        (i, [rng.uniform(-1.0, 1.0) for _ in range(dim)], i % 3)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.parquet(path)

    out = E.x12_ivf_topk(spark, str(tmp_path))
    # sanity: the stride really is the non-floor branch here
    assert max(50, math.ceil(n / 100)) == 57

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'"
    )
    compare(out, con.sql(E._X12_SQL))


def test_usable_vec_contract(spark):
    """Non-finite vectors excluded everywhere; zero vectors excluded
    only from the cosine family (kmeans/quantize keep them)."""
    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
        usable_vec,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.clustering import (
        kmeans,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    rows = [
        (0, [1.0, 2.0]),
        (1, [float("nan"), 1.0]),
        (2, [float("inf"), 1.0]),
        (3, [0.0, 0.0]),
        (4, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    usable = df.where(usable_vec(F.col("embedding")))
    assert sorted(r["vec_id"] for r in usable.collect()) == [0, 4]
    finite = df.where(usable_vec(F.col("embedding"), require_nonzero=False))
    assert sorted(r["vec_id"] for r in finite.collect()) == [0, 3, 4]
    # cosine family runs clean on the poisoned frame (ANSI would
    # otherwise raise DIVIDE_BY_ZERO on vec 3)
    got = brute_force_topk(df, df, k=2).collect()
    ids = {r["query_id"] for r in got} | {r["cand_id"] for r in got}
    assert ids == {0, 4}
    # kmeans keeps the zero vector, drops NaN/Inf, centroids all finite
    assigned, cents = kmeans(df, k=2, rounds=2)
    assert sorted(r["vec_id"] for r in assigned.collect()) == [0, 3, 4]
    import math

    assert all(math.isfinite(x) for _, vec in cents for x in vec)


def test_random_projection_known_answer(spark):
    """r_k must equal the driver-side sign matrix applied in Python."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        _RP_K,
        _rp_signs,
        x51_random_projection,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    SF = "/root/testdata/sf0.001"
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, "embeddings", SF).collect()
    }
    signs = _rp_signs(_RP_K, 64)
    got = {r["vec_id"]: r for r in x51_random_projection(spark, SF).collect()}
    assert set(got) <= set(vecs) and len(got) >= len(vecs) - 1  # finite filter
    for vid, row in list(got.items())[:25]:
        v = vecs[vid]
        for k in range(_RP_K):
            exp = 0.0
            for s, x in zip(signs[k], v):
                exp += s * float(x)
            exp *= 0.5
            assert abs(row[f"r{k}"] - exp) < 1e-4, (vid, k)


def test_lsh_auto_geometry_formula():
    """bits-per-band = max(8, ceil(log2 n)) — the SCALE.md-measured
    sizing that keeps band-bucket occupancy O(1) as the corpus grows."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        lsh_auto_geometry,
    )

    assert lsh_auto_geometry(100) == (32, 4)      # floored at 8 bits
    assert lsh_auto_geometry(2000) == (44, 4)     # ceil(log2 2000) = 11
    assert lsh_auto_geometry(60000) == (64, 4)    # 16-bit bands
    assert lsh_auto_geometry(1_000_000) == (80, 4)
    assert lsh_auto_geometry(2, bands=8) == (64, 8)
    # auto path caps at 32 bits/band: past 2^32 vectors the bucket
    # space is already executor-count-scale, and an uncapped width
    # would overflow even a long band-key fold at absurd n
    assert lsh_auto_geometry(2**40) == (32 * 4, 4)
    assert lsh_auto_geometry(2**40, max_bits=20) == (20 * 4, 4)
    assert lsh_auto_geometry(2**40, max_bits=48) == (40 * 4, 4)


def test_lsh_auto_matches_explicit_geometry(spark):
    """n_planes='auto' must be exactly the explicit call at the
    auto-chosen geometry — same pairs, same cosines."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
        usable_vec,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        embedding_lsh_near_dup_pairs,
        lsh_auto_geometry,
    )

    SF = "/root/testdata/sf0.001"
    emb = load_table(spark, "embeddings", SF)
    n_usable = emb.where(usable_vec(F.col("embedding"))).count()
    n_planes, bands = lsh_auto_geometry(n_usable)
    auto = embedding_lsh_near_dup_pairs(
        emb, n_planes="auto", threshold=0.2
    ).collect()
    explicit = embedding_lsh_near_dup_pairs(
        emb, n_planes=n_planes, bands=bands, threshold=0.2
    ).collect()
    key = lambda r: (r["id_a"], r["id_b"])  # noqa: E731
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    assert len({key(r) for r in auto}) == len(auto)


def test_fused_kernels_match_engine_nan_semantics(spark):
    """Engine total order says NaN >= t and NaN sorts first under DESC;
    numpy says neither.  The inf-norm (huge-but-finite component) corner
    must come out identical in the fused kernels and the declarative
    twin — found by the round-6 nonfinite probe."""
    import math

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.similarity import (
        assign_cells_vectorized,
        ivf_topk,
        ivf_topk_joined,
        semantic_dedup_in_cells,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [1e300, 1e300, 0.0, 0.0]),   # norm overflows to inf
        (3, [-1e300, 1e300, 1e300, 0.0]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, [0.0, 1.0, 0.0, 0.0])],
        "centroid_id long, centroid array<double>",
    )

    def canon(df):
        out = []
        for r in sorted(tuple(x) for x in df.collect()):
            out.append(
                tuple("NaN" if isinstance(v, float) and math.isnan(v) else v for v in r)
            )
        return out

    fused = canon(ivf_topk(emb, emb, cents, k=3, nprobe=2))
    joined = canon(ivf_topk_joined(emb, emb, cents, k=3, nprobe=2))
    assert fused == joined
    # vec 2 x vec 3: dot overflows to NaN via inf-inf; both carry inf
    # norms.  Engine semantics: NaN >= threshold is TRUE, so the
    # higher id of the NaN pair must be marked duplicate.
    cells = assign_cells_vectorized(emb, cents)
    one_cell = cells.withColumn("cell", cells.cell * 0)  # force same cell
    keep = {
        r.vec_id: r.keep_semantic
        for r in semantic_dedup_in_cells(one_cell, threshold=0.99).collect()
    }
    assert keep[2] is True and keep[3] is False


def test_x14_contract_recovers_planted_near_dups(spark):
    """The scored x14 contract (auto bits-per-band, threshold 0.5) on a
    corpus with PLANTED near-duplicates: a cos≈0.999 pair collides per
    band with p ≈ (1-θ/π)^bits ≈ 0.99^8 — near-certain over 4 bands —
    so every planted pair must surface with its exact cosine, while the
    random bulk (pairwise cos p99.9 ≈ 0.38 in the fixtures) stays below
    the threshold.  Pins that the r7 geometry rebind (threshold out of
    the random band, log2(n) band width) still RECALLS what it is for."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
        usable_vec,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        embedding_lsh_near_dup_pairs,
        lsh_auto_geometry,
    )

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001").where(
        usable_vec(F.col("embedding"))
    )
    base = emb.orderBy("vec_id").limit(10)
    planted = base.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.lit(0.001) * F.abs(x) + F.lit(1e-9)
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    n_planes, bands = lsh_auto_geometry(corpus.count())
    got = embedding_lsh_near_dup_pairs(
        corpus, n_planes=n_planes, bands=bands, threshold=0.5
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in got}
    base_ids = [r.vec_id for r in base.select("vec_id").collect()]
    for vid in base_ids:
        assert (vid, vid + 1_000_000) in pairs, vid
    for r in got:
        assert r.cos >= 0.5


def test_lsh_auto_geometry_max_bits_cap():
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        lsh_auto_geometry,
    )

    assert lsh_auto_geometry(1 << 30, max_bits=20) == (80, 4)
    assert lsh_auto_geometry(100, max_bits=20) == (32, 4)  # cap inactive
