"""Count-min sketch tests: python-reference hash pinning, the CMS
no-underestimate guarantee under forced collisions, linearity
(mergeability), and the x53 derived-skew fixture's separation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.sketch import (
    CMS_SEEDS,
    CMS_W,
    cms_cells,
    cms_estimate,
)

from tests.conftest import SF_DIR


def _ref_bucket(item: str, seed: int, w: int) -> int:
    """Independent python reference of the shared md5 cell contract."""
    h = int(hashlib.md5(f"{seed}|{item}".encode()).hexdigest()[:15], 16)
    return h % w


def _ref_cells(items: list[str], w: int) -> dict[tuple[int, int], int]:
    cells: dict[tuple[int, int], int] = {}
    for it in items:
        for s in CMS_SEEDS:
            key = (s, _ref_bucket(it, s, w))
            cells[key] = cells.get(key, 0) + 1
    return cells


def test_cells_match_python_reference(spark):
    items = [f"key{i}" for i in range(40)] + ["hot"] * 25
    df = spark.createDataFrame([(s,) for s in items], "item string")
    got = {
        (r["seed"], r["bucket"]): r["cell_cnt"]
        for r in cms_cells(df).collect()
    }
    assert got == _ref_cells(items, CMS_W)


def test_estimate_never_underestimates_under_forced_collisions(spark):
    # W=4: 30 distinct keys in 4 buckets — every cell is a pile-up, so
    # est > exact for most keys; the CMS guarantee is est >= exact.
    w = 4
    items = [f"k{i}" for i in range(30) for _ in range(i % 5 + 1)]
    df = spark.createDataFrame([(s,) for s in items], "item string")
    exact = df.groupBy("item").agg(F.count("*").alias("exact_cnt"))
    cells = cms_cells(df, w=w)
    est = cms_estimate(exact, cells, w=w).collect()
    assert len(est) == 30
    assert all(r["est_cnt"] >= r["exact_cnt"] for r in est)
    # the collision regime must actually be exercised
    assert any(r["est_cnt"] > r["exact_cnt"] for r in est)
    # and est is exactly min over the key's D reference cells
    ref = {}
    for it in items:
        ref[it] = ref.get(it, 0) + 1
    ref_cells: dict[tuple[int, int], int] = {}
    for it, cnt in ref.items():
        for s in CMS_SEEDS:
            key = (s, _ref_bucket(it, s, w))
            ref_cells[key] = ref_cells.get(key, 0) + cnt
    for r in est:
        want = min(
            ref_cells[(s, _ref_bucket(r["item"], s, w))] for s in CMS_SEEDS
        )
        assert r["est_cnt"] == want


def test_estimate_returns_zero_for_unseen_candidates(spark):
    # A candidate whose D cells are all absent from the sketch must
    # survive with est_cnt = 0 — CMS is a point-query structure, every
    # query has a defined answer (library contract; sketch.py:101).
    data = spark.createDataFrame([("a",), ("a",), ("b",)], "item string")
    cells = cms_cells(data)
    cand = spark.createDataFrame(
        [("a",), ("never_sketched_xyz",)], "item string"
    )
    got = {r["item"]: r["est_cnt"] for r in cms_estimate(cand, cells).collect()}
    assert set(got) == {"a", "never_sketched_xyz"}
    assert got["a"] >= 2
    assert got["never_sketched_xyz"] == 0


def test_sketch_is_linear_in_the_input(spark):
    # sketch(A ∪ B) == cellwise-sum(sketch(A), sketch(B)) — the property
    # st09's append-merge relies on
    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(50)], "item string")
    b = spark.createDataFrame([(f"b{i % 5}",) for i in range(30)], "item string")
    merged = (
        cms_cells(a)
        .unionByName(cms_cells(b))
        .groupBy("seed", "bucket")
        .agg(F.sum("cell_cnt").alias("cell_cnt"))
    )
    whole = cms_cells(a.unionByName(b))
    got = {(r["seed"], r["bucket"]): r["cell_cnt"] for r in merged.collect()}
    want = {(r["seed"], r["bucket"]): r["cell_cnt"] for r in whole.collect()}
    assert got == want


def test_weighted_build_equals_row_build(spark):
    # batch form (from pre-aggregated counts) ≡ streaming form (raw rows)
    rows = [(f"k{i % 9}",) for i in range(60)]
    df = spark.createDataFrame(rows, "item string")
    counts = df.groupBy("item").agg(F.count("*").alias("cnt"))
    from_rows = {
        (r["seed"], r["bucket"]): r["cell_cnt"] for r in cms_cells(df).collect()
    }
    from_counts = {
        (r["seed"], r["bucket"]): r["cell_cnt"]
        for r in cms_cells(counts, weight="cnt").collect()
    }
    assert from_rows == from_counts


def test_x53_invariants_and_hot_items(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x53_cms_heavy_hitters,
    )

    out = x53_cms_heavy_hitters(spark, SF_DIR).collect()
    assert all(r["never_underestimates"] for r in out)
    # no false NEGATIVES ever: every true heavy hitter is flagged
    assert all(r["is_heavy"] for r in out if r["is_true_heavy"])
    # the two derived hot items carry the top-2 exact counts and are
    # flagged heavy at every sf
    by_cnt = sorted(out, key=lambda r: -r["exact_cnt"])
    assert sorted(r["item"] for r in by_cnt[:2]) == [0, 1]
    assert all(r["is_heavy"] for r in by_cnt[:2])


def test_x53_separation_at_sf001(spark):
    """At sf0.01+ (150+ users) the uniform items sit well under N/100,
    so the heavy set is EXACTLY the two derived hot items.  (At sf0.001
    there are only 15 users — every item clears 1% — so separation is a
    scale-dependent property pinned against the sf0.01 fixture.)"""
    import os

    import pytest

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x53_cms_heavy_hitters,
    )

    sf01 = "/root/testdata/sf0.01"
    if not os.path.isdir(sf01):
        pytest.skip("sf0.01 fixture not present")
    out = x53_cms_heavy_hitters(spark, sf01).collect()
    assert sorted(r["item"] for r in out if r["is_heavy"]) == [0, 1]
    assert sorted(r["item"] for r in out if r["is_true_heavy"]) == [0, 1]


def test_cms_estimate_property_random_multisets(spark):
    """Differential property (hypothesis): for arbitrary small-alphabet
    multisets and a tiny W forcing collisions, the Spark estimate
    equals the python-reference min over the item's D cells — and
    therefore never underestimates."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        items=st.lists(
            st.sampled_from([f"t{i}" for i in range(12)]),
            min_size=1, max_size=40,
        )
    )
    def check(items):
        w = 8
        df = spark.createDataFrame([(s,) for s in items], "item string")
        exact: dict[str, int] = {}
        for it in items:
            exact[it] = exact.get(it, 0) + 1
        ref_cells: dict[tuple[int, int], int] = {}
        for it, cnt in exact.items():
            for s in CMS_SEEDS:
                key = (s, _ref_bucket(it, s, w))
                ref_cells[key] = ref_cells.get(key, 0) + cnt
        cand = df.groupBy("item").agg(F.count("*").alias("exact_cnt"))
        got = cms_estimate(cand, cms_cells(df, w=w), w=w).collect()
        assert len(got) == len(exact)
        for r in got:
            want = min(
                ref_cells[(s, _ref_bucket(r["item"], s, w))]
                for s in CMS_SEEDS
            )
            assert r["est_cnt"] == want >= exact[r["item"]]

    check()


def test_kmv_matches_python_reference(spark):
    """The whole KMV pipeline (per-source bottom-K by md5, union
    bottom-K per pair, both-membership count) against an independent
    python implementation on a controlled two-source fixture."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        KMV_K,
        x55_kmv_source_overlap,
    )

    # build docs so the (source, shingle) sets are known exactly:
    # tokens are single words -> 3-shingles are word triples
    words_a = [f"w{i}" for i in range(40)]
    words_b = [f"w{i}" for i in range(20, 60)]  # half overlap
    docs = spark.createDataFrame(
        [
            (1, " ".join(words_a), "en", "srcA", 0),
            (2, " ".join(words_b), "en", "srcB", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="kmv_")
    docs.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {
        (r["source_a"], r["source_b"]): (
            r["k_used"],
            r["matches"],
            r["est_jaccard"],
        )
        for r in x55_kmv_source_overlap(spark, d).collect()
    }

    def shingles(ws):
        return {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    sa = {h(s) for s in shingles(words_a)}
    sb = {h(s) for s in shingles(words_b)}
    ka, kb = set(sorted(sa)[:KMV_K]), set(sorted(sb)[:KMV_K])
    union_k = sorted(ka | kb)[:KMV_K]
    matches = sum(1 for x in union_k if x in ka and x in kb)
    want = (len(union_k), matches, round(matches / len(union_k), 6))
    assert got == {("srcA", "srcB"): want}


def test_kmv_estimate_tracks_exact_jaccard(spark):
    """Accuracy pin at fixture scale: the KMV estimate sits within the
    ~1/sqrt(K) band of x50's exact source-pair Jaccard (the exact join
    is affordable here; at corpus scale you'd have only the sketch)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        KMV_K,
        x50_source_similarity,
        x55_kmv_source_overlap,
    )

    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in x50_source_similarity(spark, SF_DIR).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in x55_kmv_source_overlap(spark, SF_DIR).collect()
    }
    # x50 emits only intersecting pairs; x55 emits all pairs
    assert set(exact) <= set(est)
    band = 3.0 / (KMV_K ** 0.5)  # ~3 sigma
    for pair, e in est.items():
        x = exact.get(pair, 0.0)
        assert abs(e - x) <= band, (pair, e, x)


def test_x57_split_covers_null_event_ids(spark):
    """The history/batch derivation split must be disjoint AND
    exhaustive even when event_id is NULL (NULL % k is NULL, which is
    neither < k nor >= k — an unguarded split silently drops the row
    and the merged rollup undercounts vs the one-pass oracle)."""
    import datetime as dt

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x57_mergeable_rollup,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i if i % 4 else None, base + dt.timedelta(hours=i), 1, "click", 1.5, None)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="x57_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = x57_mergeable_rollup(spark, d).collect()
    assert sum(r["n_events"] for r in out) == 20  # nothing dropped
    assert all(r["sum_value_micros"] == r["n_events"] * 1_500_000 for r in out)


def test_streaming_sketch_merge_checkpoint_recovery_exactly_once(spark, tmp_path):
    """Checkpoint-recovery exactly-once: drain a partial backlog, then
    RESTART the same stream (same checkpoint) after more files arrive —
    already-processed files must not be re-counted (a reprocessed file
    would double its cells and break the cell-for-cell equality with
    the one-shot batch sketch)."""
    import os

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        streaming_sketch_merge,
    )

    batch_dir = os.path.join(str(tmp_path), "arriving")
    cells_path = os.path.join(str(tmp_path), "cells")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    first = spark.createDataFrame(
        [(f"k{i % 11}",) for i in range(300)], "item string"
    )
    later = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(200)], "item string"
    )
    first.coalesce(1).write.parquet(batch_dir)
    streaming_sketch_merge(spark, batch_dir, cells_path, ckpt)  # drain 1
    later.coalesce(1).write.mode("append").parquet(batch_dir)
    streaming_sketch_merge(spark, batch_dir, cells_path, ckpt)  # resume
    merged = {
        (r["seed"], r["bucket"]): r["cell_cnt"]
        for r in (
            spark.read.parquet(cells_path)
            .groupBy("seed", "bucket")
            .agg(F.sum("cell_cnt").alias("cell_cnt"))
            .collect()
        )
    }
    want = {
        (r["seed"], r["bucket"]): r["cell_cnt"]
        for r in cms_cells(first.unionByName(later)).collect()
    }
    assert merged == want


def test_st09_merge_equals_batch_sketch(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        st09_streaming_sketch_merge,
        x53_cms_heavy_hitters,
    )

    batch = {
        r["item"]: (r["exact_cnt"], r["est_cnt"])
        for r in x53_cms_heavy_hitters(spark, SF_DIR).collect()
    }
    streamed = {
        r["item"]: (r["exact_cnt"], r["est_cnt"])
        for r in st09_streaming_sketch_merge(spark, SF_DIR).collect()
    }
    assert batch == streamed
