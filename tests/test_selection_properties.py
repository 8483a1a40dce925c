"""Property-based tests (hypothesis) for the corpus-selection operators
(plans.selection): token-budget selection is a greedy prefix of the
quality order on ANY corpus; the epoch shuffle is a seed-stable
permutation; mixture thresholds are monotone in domain size.

Example counts are small because each example runs Spark jobs; the
generators still cover empty text, duplicate texts, and single-doc
corpora.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (
    selection as S,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_WORDS = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "the", "a", "of", "!!!"]),
    min_size=0,
    max_size=12,
).map(" ".join)
_CORPUS = st.lists(_WORDS, min_size=1, max_size=6)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


@given(texts=_CORPUS)
@settings(**_SETTINGS)
def test_budget_selection_is_greedy_prefix(spark, texts):
    df = _docs_df(spark, texts)
    orig = S.load_table
    S.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        rows = sorted(
            S.x33_token_budget_select(spark, "ignored").collect(),
            key=lambda r: r["sel_rank"],
        )
    finally:
        S.load_table = orig
    assert len(rows) == len(texts)
    # ranks dense from 1; cumulative sum exact; selected = a prefix of
    # the rank order (greedy), cut exactly at the budget
    cum = 0
    selected_done = False
    for i, r in enumerate(rows):
        assert r["sel_rank"] == i + 1
        cum += r["n_bpe_tokens"]
        assert r["cum_tokens"] == cum
        assert r["selected"] == (cum <= S.TOKEN_BUDGET)
        if not r["selected"]:
            selected_done = True
        elif selected_done:
            raise AssertionError("selected rows are not a rank prefix")
    # the order respects quality (desc), tie-broken by doc_id
    keys = [(-r["quality"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


@given(texts=_CORPUS)
@settings(**_SETTINGS)
def test_epoch_shuffle_permutation_property(spark, texts):
    df = _docs_df(spark, texts)
    orig = S.load_table
    S.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        rows = S.x34_epoch_shuffle(spark, "ignored").collect()
    finally:
        S.load_table = orig
    assert sorted(r["epoch_pos"] for r in rows) == list(range(len(texts)))
    assert sorted(r["doc_id"] for r in rows) == list(range(len(texts)))
    # epoch_pos is block-major: positions within a block are contiguous
    by_block: dict[int, list[int]] = {}
    for r in rows:
        by_block.setdefault(r["block"], []).append(r["epoch_pos"])
    offset = 0
    for block in sorted(by_block):
        got = sorted(by_block[block])
        assert got == list(range(offset, offset + len(got)))
        offset += len(got)


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=4)
)
@settings(**_SETTINGS)
def test_mixture_threshold_monotone_in_domain_size(spark, sizes):
    texts, srcs = [], []
    for s_idx, n in enumerate(sizes):
        for i in range(n):
            texts.append(f"doc {s_idx} {i}")
            srcs.append(f"src{s_idx}")
    df = spark.createDataFrame(
        [(i, t, s) for i, (t, s) in enumerate(zip(texts, srcs))],
        "doc_id: long, text: string, source: string",
    )
    orig = S.load_table
    S.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        rows = S.x36_mixture_sample(spark, "ignored").collect()
    finally:
        S.load_table = orig
    thr_by_n: dict[int, int] = {}
    for r in rows:
        thr_by_n[r["n_source"]] = r["keep_threshold"]
        assert 0 <= r["keep_threshold"] <= S.MIX_H
    pairs = sorted(thr_by_n.items())
    # bigger domains never get a LARGER keep-threshold (downsampling)
    for (n1, t1), (n2, t2) in zip(pairs, pairs[1:]):
        assert t2 <= t1


@given(texts=_CORPUS)
@settings(**_SETTINGS)
def test_chunking_reconstructs_every_document(spark, texts):
    """x38 on ANY corpus: taking the first CHUNK_STRIDE tokens of every
    chunk (all of the last) in chunk_seq order reconstructs the
    document's token sequence exactly; empty docs yield no chunks."""
    df = _docs_df(spark, texts)
    orig = S.load_table
    S.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        out = S.x38_chunk_documents(spark, "ignored").collect()
    finally:
        S.load_table = orig
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        toks = t.split()
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_seq"])
        if not toks:
            assert chunks == []
            continue
        rebuilt: list[str] = []
        for j, r in enumerate(chunks):
            ctoks = r["chunk_text"].split()
            assert len(ctoks) == r["n_chunk_tokens"]
            last = j == len(chunks) - 1
            rebuilt.extend(ctoks if last else ctoks[: S.CHUNK_STRIDE])
        assert rebuilt == toks
        # overlap property: each non-first chunk repeats the previous
        # chunk's tail when the previous chunk was full-size
        for prev, cur in zip(chunks, chunks[1:]):
            ptoks = prev["chunk_text"].split()
            ctoks = cur["chunk_text"].split()
            if len(ptoks) == S.CHUNK_TOKENS:
                ov = S.CHUNK_TOKENS - S.CHUNK_STRIDE
                assert ctoks[:ov] == ptoks[S.CHUNK_STRIDE:]


@given(texts=_CORPUS)
@settings(**_SETTINGS)
def test_vocab_two_phase_rank_equals_sorted_counts(spark, texts):
    """x39 on ANY corpus: the sharded two-phase rank equals the plain
    python (cnt DESC, token ASC) sort, and fractions are exact."""
    df = _docs_df(spark, texts)
    orig = S.load_table
    S.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        rows = sorted(
            S.x39_vocab_coverage(spark, "ignored").collect(),
            key=lambda r: r["rank"],
        )
    finally:
        S.load_table = orig
    from collections import Counter

    counts = Counter(
        tok for t in texts for tok in t.lower().split() if tok
    )
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        : S.VOCAB_SIZE
    ]
    assert [(r["token"], r["cnt"]) for r in rows] == expected
    total = sum(counts.values())
    cum = 0
    for r in rows:
        cum += r["cnt"]
        # frac/cum_frac are scale-6 rounded (functions.rounding), so
        # agreement is to the half-ulp of that scale
        assert abs(r["frac"] - r["cnt"] / total) <= 5e-7
        assert abs(r["cum_frac"] - cum / total) <= 5e-7


@given(
    texts=st.lists(
        st.sampled_from(
            # tiny vocabulary + heavy repetition → many EXACT quality
            # ties, the adversarial case for x52's two-phase global
            # rank (ties must land in one shard and break by doc_id)
            ["alpha beta", "alpha beta", "the the the", "", "gamma !!!"]
        ),
        min_size=1,
        max_size=10,
    ),
    srcs=st.lists(st.sampled_from(["web", "forum", None]), min_size=10, max_size=10),
)
@settings(**_SETTINGS)
def test_source_calibration_matches_global_percent_rank(spark, texts, srcs):
    """pct_global from the monotone-shard two-phase kernel must equal
    the textbook percent_rank of the ONE global (quality, doc_id) sort,
    and pct_in_source its per-source twin — under heavy quality ties
    and NULL sources."""
    df = spark.createDataFrame(
        [(i, t, srcs[i % len(srcs)]) for i, t in enumerate(texts)],
        "doc_id: long, text: string, source: string",
    )
    orig = S.load_table
    S.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        rows = S.x52_source_calibration(spark, "ignored").collect()
    finally:
        S.load_table = orig
    assert len(rows) == len(texts)

    def pct_ranks(group):
        order = sorted(group, key=lambda r: (r["quality"], r["doc_id"]))
        n = len(order)
        return {
            r["doc_id"]: (0.0 if n == 1 else i / (n - 1))
            for i, r in enumerate(order)
        }

    expect_global = pct_ranks(rows)
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for r in rows:
        assert r["pct_global"] == pytest.approx(
            expect_global[r["doc_id"]], abs=1e-6
        ), r
        assert r["pct_in_source"] == pytest.approx(
            pct_ranks(by_src[r["source"]])[r["doc_id"]], abs=1e-6
        ), r
