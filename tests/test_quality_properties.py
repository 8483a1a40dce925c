"""Property-based tests (hypothesis) for the corpus-hygiene gates
(plans.quality): redaction is idempotent and never leaves a detectable
match behind; repetition fractions are bounded and consistent;
contamination counts are bounded by totals and respond monotonically to
benchmark growth.

Example counts are small because each example runs Spark jobs; the
generators still cover empty strings, PII-dense strings, and
single-token documents.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
    contamination_check,
    pii_counts,
    pii_redact,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# text fragments that interleave clean words with every PII kind
_PII_BITS = st.sampled_from(
    [
        "hello world",
        "a@b.io",
        "first.last+x@corp.example.com",
        "555-123-4567",
        "+44 202 555 0199",
        "10.0.0.1",
        "255.255.255.255",
        "123-45-6789",
        "",
        "punct !!! ###",
    ]
)
_TEXTS = st.lists(
    st.lists(_PII_BITS, max_size=6).map(" ".join), min_size=1, max_size=6
)


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_redaction_idempotent_and_complete(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    once = df.select("doc_id", pii_redact("text").alias("text"))
    twice = once.select("doc_id", pii_redact("text").alias("text"))
    got_once = {r["doc_id"]: r["text"] for r in once.collect()}
    got_twice = {r["doc_id"]: r["text"] for r in twice.collect()}
    # idempotent: redacting redacted text changes nothing
    assert got_once == got_twice
    # complete: no pattern matches anything in the redacted output
    residual = once.select(
        *[c.alias(k) for k, c in pii_counts("text").items()]
    ).agg(*[F.sum(k).alias(k) for k in pii_counts("text")]).collect()[0]
    assert all(residual[k] == 0 for k in pii_counts("text"))


@given(texts=_TEXTS)
@settings(**_SETTINGS)
def test_pii_counts_nonnegative_and_zero_on_clean(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    counts = df.select(
        "doc_id", *[c.alias(k) for k, c in pii_counts("text").items()]
    ).collect()
    for r in counts:
        for k in pii_counts("text"):
            assert r[k] >= 0


_WORDS = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=10
).map(" ".join)


@given(texts=st.lists(_WORDS, min_size=1, max_size=5))
@settings(**_SETTINGS)
def test_repetition_fractions_bounded(spark, texts):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    orig = quality.load_table
    quality.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        rows = quality.x29_repetition_filters(spark, "ignored").collect()
    finally:
        quality.load_table = orig
    assert len(rows) == len(texts)
    for r in rows:
        for col in (
            "dup_token_frac",
            "top_token_frac",
            "dup_2gram_frac",
            "dup_3gram_frac",
        ):
            assert 0.0 <= r[col] <= 1.0, (col, r)
        # a non-empty doc's most frequent token occurs at least once
        # (5e-7 = half an ulp of the scale-6 rounding contract: 1/3
        # rounds to 0.333333, which sits ~3.3e-7 below the true value)
        if r["rep_n_tokens"] > 0:
            assert r["top_token_frac"] >= 1.0 / r["rep_n_tokens"] - 5e-7


@given(
    train=st.lists(_WORDS, min_size=1, max_size=4),
    bench_small=st.lists(_WORDS, max_size=2),
    bench_extra=st.lists(_WORDS, max_size=2),
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_contamination_bounded_and_monotone_in_benchmark(
    spark, train, bench_small, bench_extra
):
    train_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id: long, text: string"
    )

    def _bench(texts):
        return spark.createDataFrame(
            [(1000 + i, t) for i, t in enumerate(texts)],
            "doc_id: long, text: string",
        )

    small = {
        r["doc_id"]: r
        for r in contamination_check(train_df, _bench(bench_small), n=2).collect()
    }
    big = {
        r["doc_id"]: r
        for r in contamination_check(
            train_df, _bench(bench_small + bench_extra), n=2
        ).collect()
    }
    assert set(small) == set(big)  # output docs depend only on the train side
    for doc_id, r in small.items():
        assert 0 <= r["contam_ngrams"] <= r["total_ngrams"]
        # growing the benchmark can only find MORE contaminated n-grams
        assert big[doc_id]["contam_ngrams"] >= r["contam_ngrams"]
        assert big[doc_id]["total_ngrams"] == r["total_ngrams"]


_WORDS = st.sampled_from(["a", "b", "c", "d", "e", "f"])
_DOC_TEXTS = st.lists(
    st.lists(_WORDS, max_size=8).map(" ".join), min_size=1, max_size=6
)


@given(texts=_DOC_TEXTS)
@settings(**_SETTINGS)
def test_passage_dedup_invariants(spark, texts):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        passage_dedup,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = {r["doc_id"]: r for r in passage_dedup(df, w=3).collect()}
    # every doc present exactly once, shared bounded by total, frac in [0,1]
    assert set(got) == set(range(len(texts)))
    for r in got.values():
        assert 0 <= r["n_shared_passages"] <= r["n_passages"]
        assert 0.0 <= r["shared_passage_frac"] <= 1.0
        n_toks = len([t for t in texts[r["doc_id"]].split() if t])
        assert r["n_passages"] <= max(0, n_toks - 2)


@given(texts=_DOC_TEXTS)
@settings(**_SETTINGS)
def test_passage_dedup_exact_copy_fully_shared(spark, texts):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        passage_dedup,
    )

    # append an exact copy of doc 0 under a new id: every passage of
    # both copies must be flagged shared (frac 1.0 when any passage
    # exists)
    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((len(texts), texts[0]))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in passage_dedup(df, w=3).collect()}
    for d in (0, len(texts)):
        r = got[d]
        if r["n_passages"] > 0:
            assert r["n_shared_passages"] == r["n_passages"]
            assert r["shared_passage_frac"] == 1.0
            assert not r["keep_passage"]


@given(texts=st.lists(
    st.lists(_WORDS, max_size=12).map(" ".join), min_size=1, max_size=8
))
@settings(**_SETTINGS)
def test_passage_dedup_differential_vs_duckdb(spark, texts):
    """Spark passage_dedup ≡ the x40 DuckDB oracle on random corpora,
    not just the fixture (hash-keyed window vs string-keyed SQL)."""
    import duckdb
    import pandas as pd

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        _X40_SQL,
        passage_dedup,
    )
    from tests.oracle_compare import compare

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = passage_dedup(df)  # default w=8 — matches _X40_SQL's geometry
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    compare(got, con.sql(_X40_SQL))


_MAYBE_NULL_TEXTS = st.lists(
    st.one_of(st.none(), st.lists(_WORDS, max_size=8).map(" ".join)),
    min_size=1,
    max_size=6,
)


@given(texts=_MAYBE_NULL_TEXTS)
@settings(**_SETTINGS)
def test_null_contract_signatures_exclude_analysis_keeps(spark, texts):
    """The NULL contract: signature ops EXCLUDE NULL-text docs; analysis
    ops keep every doc with NULL ≡ '' metrics."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.dedup import (
        minhash_signature_array,
        simhash_signatures,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        passage_dedup,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    n_nonnull = sum(1 for t in texts if t is not None)
    assert minhash_signature_array(df).count() == n_nonnull
    assert simhash_signatures(df).count() == n_nonnull
    # analysis family: every doc keeps a row; NULL text → zero passages
    got = {r["doc_id"]: r for r in passage_dedup(df, w=3).collect()}
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        if t is None:
            assert got[i]["n_passages"] == 0 and got[i]["keep_passage"]


@given(texts=st.lists(
    st.lists(_WORDS, max_size=12).map(" ".join), min_size=1, max_size=8
))
@settings(**_SETTINGS)
def test_lm_quality_differential_vs_duckdb(spark, texts):
    """Spark lm_quality ≡ the x42 DuckDB oracle on random corpora, not
    just the fixture — exercises all-in-vocab corpora (≤6 distinct
    tokens here, vocab 24) and empty/token-less documents, where the
    <unk> mass and NULL-metrics paths differ most between engines."""
    import duckdb
    import pandas as pd

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        _X42_SQL,
        lm_quality,
    )
    from tests.oracle_compare import compare

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = lm_quality(df)  # default geometry — matches _X42_SQL
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    compare(got, con.sql(_X42_SQL))


# ---------------------------------------------------------------------------
# x68/x69 duplicated-span coverage vs a brute-force reference
# ---------------------------------------------------------------------------

_W = 3
_SPAN_TOKENS = st.lists(
    st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
)


def _ref_span_stats(texts: dict[int, str], w: int):
    """Brute-force reference: dup windows by string, interval union by
    overlap-only merge (gap > w-1 splits), per-doc stats + clean text."""
    toks = {
        d: [t for t in (txt or "").split() if t] for d, txt in texts.items()
    }
    owners: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - w + 1):
            owners.setdefault(" ".join(ts[i : i + w]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        starts = [
            i + 1
            for i in range(len(ts) - w + 1)
            if len(owners[" ".join(ts[i : i + w])]) >= 2
        ]
        merged: list[list[int]] = []
        for p in starts:
            if merged and p <= merged[-1][1]:
                merged[-1][1] = p + w - 1
            else:
                merged.append([p, p + w - 1])
        covered = {i for s, e in merged for i in range(s, e + 1)}
        clean = " ".join(t for i, t in enumerate(ts, 1) if i not in covered)
        out[d] = dict(
            n_tokens=len(ts),
            dup_spans=len(merged),
            dup_tokens=sum(e - s + 1 for s, e in merged),
            max_span=max((e - s + 1 for s, e in merged), default=0),
            clean_text=clean,
        )
    return out


@given(
    st.lists(_SPAN_TOKENS, min_size=2, max_size=4).map(
        lambda ds: {i: " ".join(t) for i, t in enumerate(ds)}
    )
)
@settings(**_SETTINGS)
def test_duplicate_spans_matches_bruteforce(spark, texts):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        duplicate_spans,
        span_cut_text,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    ref = _ref_span_stats(texts, _W)
    got68 = {r["doc_id"]: r for r in duplicate_spans(df, w=_W).collect()}
    got69 = {r["doc_id"]: r for r in span_cut_text(df, w=_W).collect()}
    assert set(got68) == set(ref) == set(got69)
    for d, exp in ref.items():
        assert got68[d]["n_tokens"] == exp["n_tokens"]
        assert got68[d]["dup_spans"] == exp["dup_spans"]
        assert got68[d]["dup_tokens"] == exp["dup_tokens"]
        assert got68[d]["max_span_tokens"] == exp["max_span"]
        assert got69[d]["clean_text"] == exp["clean_text"]
        assert got69[d]["removed_tokens"] == exp["dup_tokens"]
