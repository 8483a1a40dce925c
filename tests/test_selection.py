"""Semantic invariants for the corpus-selection operators
(plans.selection) beyond the oracle hash comparison in
test_driver_queries: canonical uniqueness and quality-maximality (x32),
budget feasibility and greedy maximality (x33), permutation and
determinism properties of the epoch shuffle (x34).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (
    selection as S,
)

from tests.conftest import SF_DIR


def test_canonical_unique_and_quality_max_per_cluster(spark):
    out = S.x32_canonical_docs(spark, SF_DIR).cache()
    per_cluster = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.max("quality").alias("max_q"),
        F.max(F.when(F.col("is_canonical"), F.col("quality"))).alias(
            "canon_q"
        ),
    )
    bad = per_cluster.where(
        (F.col("n_canon") != 1) | (F.col("canon_q") != F.col("max_q"))
    ).count()
    assert bad == 0
    # every document appears exactly once
    n_docs = out.count()
    assert out.select("doc_id").distinct().count() == n_docs
    out.unpersist()


def test_singleton_docs_are_their_own_canonical_cluster(spark):
    out = S.x32_canonical_docs(spark, SF_DIR)
    singletons = (
        out.groupBy("cluster_id")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("only_doc"))
        .where(F.col("n") == 1)
    )
    labeled = out.join(singletons, "cluster_id")
    # a singleton's cluster_id is its own doc_id and it is canonical
    bad = labeled.where(
        (F.col("cluster_id") != F.col("doc_id")) | (~F.col("is_canonical"))
    ).count()
    assert bad == 0


def test_token_budget_feasible_and_greedy_maximal(spark):
    out = S.x33_token_budget_select(spark, SF_DIR).cache()
    sel = out.where("selected")
    # feasibility: the selected set fits the budget
    total = sel.agg(F.sum("n_bpe_tokens")).collect()[0][0] or 0
    assert total <= S.TOKEN_BUDGET
    # greedy maximality: the best-ranked rejected doc would overflow
    first_rejected = (
        out.where(~F.col("selected")).orderBy("sel_rank").limit(1).collect()
    )
    if first_rejected:
        assert first_rejected[0]["cum_tokens"] > S.TOKEN_BUDGET
    # sel_rank is a dense permutation 1..n and cum_tokens is
    # non-decreasing along it (token counts are non-negative)
    n = out.count()
    ranks = [r["sel_rank"] for r in out.select("sel_rank").collect()]
    assert sorted(ranks) == list(range(1, n + 1))
    rows = out.orderBy("sel_rank").select("cum_tokens", "n_bpe_tokens").collect()
    prev = 0
    for r in rows:
        assert r["cum_tokens"] == prev + r["n_bpe_tokens"]
        prev = r["cum_tokens"]
    out.unpersist()


def test_epoch_shuffle_is_deterministic_permutation(spark):
    a = S.x34_epoch_shuffle(spark, SF_DIR)
    n = a.count()
    pos = [r["epoch_pos"] for r in a.select("epoch_pos").collect()]
    assert sorted(pos) == list(range(n))
    # bit-for-bit deterministic across independent builds
    b = S.x34_epoch_shuffle(spark, SF_DIR)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_incremental_dedup_flags_injected_duplicate(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        band_signatures,
        incremental_lsh_matches,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different text about spark physical plans"),
            (3, "a third unrelated document mentioning chess openings"),
        ],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [
            # verbatim duplicate of corpus doc 1 → must collide
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            # novel text → no collision
            (11, "entirely novel content that shares no shingles at all"),
        ],
        "doc_id: long, text: string",
    )
    index = band_signatures(corpus, num_hashes=8, bands=4)
    out = {
        r["doc_id"]: r
        for r in incremental_lsh_matches(
            index, batch, num_hashes=8, bands=4
        ).collect()
    }
    assert set(out) == {10, 11}
    assert not out[10]["is_novel"] and out[10]["first_match"] == 1
    assert out[11]["is_novel"] and out[11]["first_match"] is None
    assert out[11]["n_corpus_collisions"] == 0


def test_incremental_dedup_agrees_with_self_join_pairs(spark):
    """Probing batch-vs-index finds exactly the batch↔corpus pairs the
    full self-join would (restricted to cross-side pairs)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        BATCH_MOD,
        x35_incremental_dedup,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        _MINHASH_BANDS,
        _MINHASH_N,
        _MINHASH_SHINGLE,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    docs = load_table(spark, "documents", SF_DIR)
    pairs = minhash_lsh_pairs(
        docs,
        num_hashes=_MINHASH_N,
        bands=_MINHASH_BANDS,
        shingle_len=_MINHASH_SHINGLE,
    )
    cross = pairs.where(
        ((F.col("id_a") % BATCH_MOD == 0) & (F.col("id_b") % BATCH_MOD != 0))
        | ((F.col("id_a") % BATCH_MOD != 0) & (F.col("id_b") % BATCH_MOD == 0))
    )
    expected = set()
    for r in cross.collect():
        b, c = (
            (r["id_a"], r["id_b"])
            if r["id_a"] % BATCH_MOD == 0
            else (r["id_b"], r["id_a"])
        )
        expected.add((b, c))
    got = x35_incremental_dedup(spark, SF_DIR)
    flagged = {
        r["doc_id"]
        for r in got.where(~F.col("is_novel")).collect()
    }
    assert flagged == {b for b, _ in expected}


def test_mixture_sample_rates_follow_sqrt_temperature(spark):
    out = S.x36_mixture_sample(spark, SF_DIR).cache()
    per_src = (
        out.groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("sampled").cast("int")).alias("taken"),
            F.first("keep_threshold").alias("thr"),
            F.first("n_source").alias("n_source"),
        )
        .collect()
    )
    import math

    for r in per_src:
        assert r["n"] == r["n_source"]
        expect_thr = min(
            S.MIX_H, math.floor(S.MIX_C * S.MIX_H / math.sqrt(r["n"]))
        )
        assert r["thr"] == expect_thr
        # expected take ≈ MIX_C·√n; the md5 gate is uniform, so the
        # realized take should be within a generous binomial bound
        p = expect_thr / S.MIX_H
        mean = r["n"] * p
        slack = 5 * math.sqrt(max(mean, 1.0)) + 1
        assert abs(r["taken"] - mean) <= slack, (r["source"], r["taken"], mean)
    # determinism: same seed, same membership
    again = S.x36_mixture_sample(spark, SF_DIR)
    assert out.exceptAll(again).count() == 0
    out.unpersist()


def test_streaming_incremental_dedup_matches_batch_probe(spark, tmp_path):
    """Two micro-batches probed against a persisted index produce exactly
    the one-shot batch verdicts."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        band_signatures,
        incremental_lsh_matches,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        streaming_incremental_dedup,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely different text about spark physical plans"),
        ],
        "doc_id: long, text: string",
    )
    batch = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog tonight"),
            (11, "entirely novel content that shares no shingles at all"),
            (12, "completely different text about spark physical plans"),
        ],
        "doc_id: long, text: string",
    )
    index_path = str(tmp_path / "index")
    batch_dir = str(tmp_path / "batch")
    out_path = str(tmp_path / "out")
    band_signatures(corpus, num_hashes=8, bands=4).write.parquet(index_path)
    batch.repartition(2).write.parquet(batch_dir)  # ≥2 micro-batches
    streaming_incremental_dedup(
        spark,
        batch_dir,
        index_path,
        out_path,
        str(tmp_path / "ckpt"),
        num_hashes=8,
        bands=4,
    )
    streamed = {
        r["doc_id"]: (r["n_corpus_collisions"], r["first_match"], r["is_novel"])
        for r in spark.read.parquet(out_path).collect()
    }
    index = spark.read.parquet(index_path)
    expected = {
        r["doc_id"]: (r["n_corpus_collisions"], r["first_match"], r["is_novel"])
        for r in incremental_lsh_matches(
            index, batch, num_hashes=8, bands=4
        ).collect()
    }
    assert streamed == expected
    assert not streamed[10][2] and not streamed[12][2] and streamed[11][2]


def test_leakage_safe_split_keeps_clusters_together(spark):
    out = S.x37_leakage_safe_split(spark, SF_DIR).cache()
    # every doc assigned exactly one split; whole corpus covered
    assert out.where(F.col("split").isNull()).count() == 0
    n = out.count()
    assert out.select("doc_id").distinct().count() == n
    # the leakage invariant: one split per cluster
    straddling = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddling == 0
    # all three splits realized on the fixture
    assert {r["split"] for r in out.select("split").distinct().collect()} == {
        "train",
        "val",
        "test",
    }
    out.unpersist()


def test_epoch_shuffle_seed_changes_order(spark, monkeypatch):
    base = {
        r["doc_id"]: r["epoch_pos"]
        for r in S.x34_epoch_shuffle(spark, SF_DIR).collect()
    }
    monkeypatch.setattr(S, "EPOCH_SEED", "epoch1")
    other = {
        r["doc_id"]: r["epoch_pos"]
        for r in S.x34_epoch_shuffle(spark, SF_DIR).collect()
    }
    assert set(base) == set(other)
    # same doc set, different order (astronomically unlikely to collide)
    assert base != other


def test_chunking_tiles_every_document(spark):
    """x38: chunks tile [0, n_tokens) at CHUNK_STRIDE spacing, each
    holds min(CHUNK_TOKENS, n - start) tokens, and rejoining a chunk's
    text yields exactly its token count."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.text import (
        token_count,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    out = S.x38_chunk_documents(spark, SF_DIR).cache()
    docs = load_table(spark, "documents", SF_DIR).select(
        "doc_id", token_count("text").alias("n")
    )
    j = out.join(docs, "doc_id")
    bad = j.where(
        (F.col("start_token") != F.col("chunk_seq") * S.CHUNK_STRIDE)
        | (
            F.col("n_chunk_tokens")
            != F.least(
                F.lit(S.CHUNK_TOKENS), F.col("n") - F.col("start_token")
            )
        )
        | (token_count("chunk_text") != F.col("n_chunk_tokens"))
    ).count()
    assert bad == 0
    # chunk count per doc = floor((n-1)/stride) + 1 for non-empty docs;
    # empty docs emit no chunks
    per_doc = out.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    full = docs.join(per_doc, "doc_id", "left")
    bad_counts = full.where(
        F.coalesce("n_chunks", F.lit(0))
        != F.when(F.col("n") >= 1, F.floor((F.col("n") - 1) / S.CHUNK_STRIDE) + 1)
        .otherwise(0)
    ).count()
    assert bad_counts == 0
    out.unpersist()


def test_vocab_coverage_matches_global_rank(spark):
    """x39: the two-phase sharded rank/cumsum equals the naive global
    window over the distinct-token table, and coverage fractions are
    consistent and monotone."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.text import (
        tokens,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )
    from pyspark.sql import Window

    out = S.x39_vocab_coverage(spark, SF_DIR).cache()
    docs = load_table(spark, "documents", SF_DIR)
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    naive = (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= S.VOCAB_SIZE)
        .select("rank", "token", "cnt")
    )
    mism = (
        out.select("rank", "token", "cnt")
        .exceptAll(naive)
        .union(naive.exceptAll(out.select("rank", "token", "cnt")))
        .count()
    )
    assert mism == 0
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(
        a["cum_frac"] < b["cum_frac"] for a, b in zip(rows, rows[1:])
    )
    assert all(
        a["cnt"] >= b["cnt"] for a, b in zip(rows, rows[1:])
    )
    assert rows[-1]["cum_frac"] <= 1.0 + 1e-9
    out.unpersist()


def test_x41_semantic_dedup_contract(spark):
    """Every usable vector labeled once; keep-first: within any cell the
    lowest id is always kept; both outcomes occur on the fixture."""
    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x41_semantic_dedup,
    )
    from tests.conftest import SF_DIR

    out = x41_semantic_dedup(spark, SF_DIR).cache()
    assert out.count() == out.select("vec_id").distinct().count()
    kept = out.where("keep_semantic").count()
    dropped = out.where("NOT keep_semantic").count()
    assert kept > 0 and dropped > 0  # threshold calibrated to fixture
    # the minimum id of every cell has no lower-id neighbor → always kept
    min_per_cell = out.groupBy("cell").agg(F.min("vec_id").alias("vec_id"))
    n_min_dropped = (
        out.join(min_per_cell, ["cell", "vec_id"])
        .where("NOT keep_semantic")
        .count()
    )
    assert n_min_dropped == 0
    out.unpersist()


def test_snapshot_diff_known_answer(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        snapshot_diff,
    )

    prev = spark.createDataFrame(
        [(1, "alpha beta"), (2, "old text"), (3, "stable"), (5, None)],
        "doc_id: long, text: string",
    )
    curr = spark.createDataFrame(
        [(1, "alpha beta"), (2, "new text"), (4, "brand new"), (5, None)],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(prev, curr).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",  # NULL text in both: null-safe compare
    }


def test_snapshot_diff_normalized_content_identity(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        snapshot_diff,
    )

    # fingerprint identity is casefolded + whitespace-normalized: a
    # reformatted crawl of the same page is NOT a content change
    prev = spark.createDataFrame([(1, "Hello   World")], "doc_id: long, text: string")
    curr = spark.createDataFrame([(1, "hello world")], "doc_id: long, text: string")
    [r] = snapshot_diff(prev, curr).collect()
    assert r["status"] == "unchanged"


def test_x44_fixture_all_statuses_and_counts(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        SNAP_ADDED_MOD,
        SNAP_CHANGED_MOD,
        SNAP_REMOVED_MOD,
        x44_snapshot_diff,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    out = x44_snapshot_diff(spark, SF_DIR)
    got = {r["status"]: r["n"] for r in out.groupBy("status").count()
           .withColumnRenamed("count", "n").collect()}
    ids = [
        r["doc_id"]
        for r in load_table(spark, "documents", SF_DIR).select("doc_id").collect()
    ]
    exp = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
    for i in ids:
        in_prev = i % SNAP_ADDED_MOD != 0
        in_curr = i % SNAP_REMOVED_MOD != 0
        if not in_prev and not in_curr:
            continue
        if not in_prev:
            exp["added"] += 1
        elif not in_curr:
            exp["removed"] += 1
        elif i % SNAP_CHANGED_MOD == 0:
            exp["changed"] += 1
        else:
            exp["unchanged"] += 1
    assert got == {k: v for k, v in exp.items() if v > 0}
    assert all(v > 0 for v in exp.values())  # all four statuses bind


def test_suite_kernel_sharing_preserves_subquery_output(spark):
    """The x32 suite hands a precomputed cluster frame to x32/x37
    (suites._corpus_selection_suite); suite rows must be IDENTICAL to
    each standalone query's rows — kernel sharing is an execution
    optimization, never a semantic one."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    suite_rows = suites.SUITE_QUERIES["x32_corpus_selection"](
        spark, SF_DIR
    ).collect()
    by_sub: dict[str, set] = {}
    for r in suite_rows:
        by_sub.setdefault(r["sub"], set()).add(
            tuple(str(v) for k, v in sorted(r.asDict().items()) if k != "sub")
        )
    for sub in ("x32_canonical_docs", "x37_leakage_safe_split"):
        standalone = suites._FINE_QUERIES[sub](spark, SF_DIR)
        cols = sorted(standalone.columns)
        want = {
            tuple(str(row[c]) for c in cols) for row in standalone.collect()
        }
        # suite rows are the union-tagged superset schema; project the
        # sub-query's own columns back out in the same sorted order
        got = {
            tuple(
                v
                for (k, v) in zip(
                    sorted(
                        k2
                        for k2 in suite_rows[0].asDict()
                        if k2 != "sub"
                    ),
                    t,
                )
                if k in cols
            )
            for t in by_sub[sub]
        }
        assert got == want, f"suite output drifted from standalone {sub}"


def _docs_dir(spark, tmp_path, rows):
    """(doc_id, text, lang, source, n_chars) parquet dir usable as a
    sf_dir for operators that only load the documents table."""
    d = str(tmp_path / "docs_sf")
    spark.createDataFrame(
        [(i, t, "en", s, len(t or "")) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_source_quota_caps_and_ranks(spark):
    out = S.x46_source_quota(spark, SF_DIR).collect()
    per_src: dict[str, list] = {}
    for r in out:
        per_src.setdefault(r["source"], []).append(r)
    for src, rows in per_src.items():
        assert len(rows) <= S.SRC_QUOTA
        assert sorted(r["src_rank"] for r in rows) == list(
            range(1, len(rows) + 1)
        ), f"ranks not contiguous for {src}"
        # rank order agrees with the (quality DESC, doc_id ASC) policy
        ordered = sorted(rows, key=lambda r: (-r["quality"], r["doc_id"]))
        assert [r["doc_id"] for r in ordered] == [
            r["doc_id"]
            for r in sorted(rows, key=lambda r: r["src_rank"])
        ]


def test_source_quota_two_phase_equals_plain_rank(spark, tmp_path):
    """A source larger than SALTS·Q: the salted two-phase cut must equal
    the straightforward single-window formulation."""
    rows = [(i, f"doc {i} " + "word " * (i % 37), f"s{i % 2}") for i in range(120)]
    d = _docs_dir(spark, tmp_path, rows)
    got = {
        (r["doc_id"], r["src_rank"])
        for r in S.x46_source_quota(spark, d).collect()
    }
    scored = sorted(
        (
            (r["doc_id"], r["source"], r["quality"])
            for r in spark.read.parquet(d + "/documents.parquet")
            .select(
                "doc_id",
                "source",
                S.quality_score(F.coalesce(F.col("text"), F.lit(""))).alias(
                    "quality"
                ),
            )
            .collect()
        ),
        key=lambda t: (t[1], -t[2], t[0]),
    )
    want = set()
    rank, prev_src = 0, None
    for doc_id, src, _q in scored:
        rank = rank + 1 if src == prev_src else 1
        prev_src = src
        if rank <= S.SRC_QUOTA:
            want.add((doc_id, rank))
    assert got == want


def test_weighted_sample_is_deterministic_and_sized(spark):
    a = S.x47_weighted_sample(spark, SF_DIR).collect()
    b = S.x47_weighted_sample(spark, SF_DIR).collect()
    key = lambda rows: sorted((r["doc_id"], r["es_key"]) for r in rows)  # noqa: E731
    assert key(a) == key(b)
    assert len(a) == S.WS_K


def test_weighted_sample_prefers_quality(spark, tmp_path):
    """With one very-high-quality doc among junk, the E-S draw keeps it:
    its key is scaled by 1/w, so w >> others makes selection near-sure.
    Construct quality ≈ 1 vs quality ≈ tiny and check inclusion."""
    rows = [(0, "the of and is in it you that he was " * 5, "good")]
    rows += [(i, "!!!???!!!", "junk") for i in range(1, 200)]
    d = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"] for r in S.x47_weighted_sample(spark, d).collect()}
    assert 0 in got
    assert len(got) == S.WS_K


def test_source_similarity_known_answer(spark, tmp_path):
    """Two sources sharing half their shingles, one disjoint source."""
    rows = [
        (1, "a b c d e", "s1"),      # shingles: abc bcd cde
        (2, "a b c x y", "s2"),      # shingles: abc bcx cxy
        (3, "p q r s t", "s3"),      # disjoint
    ]
    d = _docs_dir(spark, tmp_path, rows)
    got = {
        (r["source_a"], r["source_b"]): (r["n_inter"], r["jaccard"])
        for r in S.x50_source_similarity(spark, d).collect()
    }
    # |s1 ∩ s2| = 1 ('a b c'), |s1 ∪ s2| = 5
    assert got == {("s1", "s2"): (1, 0.2)}


def test_source_calibration_percentile_contract(spark):
    out = S.x52_source_calibration(spark, SF_DIR).collect()
    by_src: dict[str, list] = {}
    for r in out:
        assert 0.0 <= r["pct_in_source"] <= 1.0
        assert 0.0 <= r["pct_global"] <= 1.0
        by_src.setdefault(r["source"], []).append(r)
    for rows in by_src.values():
        if len(rows) > 1:
            pcts = sorted(r["pct_in_source"] for r in rows)
            assert pcts[0] == 0.0 and pcts[-1] == 1.0
        # percentile order agrees with quality order (ties share pct)
        srt = sorted(rows, key=lambda r: (r["quality"], r["doc_id"]))
        for a, b in zip(srt, srt[1:]):
            assert a["pct_in_source"] <= b["pct_in_source"]
