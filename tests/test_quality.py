"""Corpus-hygiene gates (plans.quality): repetition filters, PII
scan/redaction, benchmark contamination.

The driver oracle (x29/x30/x31 in the x08_text_quality_suite) pins
fixture parity; these tests pin the *semantics* on constructed inputs —
in particular PII detection, which the deliberately PII-free fixture
cannot exercise."""

from __future__ import annotations

from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
    CONTAM_BENCH_MOD,
    PII_PATTERNS,
    contamination_check,
    pii_counts,
    pii_redact,
    x29_repetition_filters,
    x30_pii_scan,
    x31_contamination,
)
from tests.conftest import SF_DIR


def _pii_df(spark):
    rows = [
        (1, "contact alice@example.com or bob.smith+tag@mail.co.uk today"),
        (2, "call +1-555-123-4567 or (555) 987-6543 now"),
        (3, "server at 192.168.1.10 and 10.0.0.255 responded"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "clean text with no identifiers at all"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pii_counts_detect_each_kind(spark):
    df = _pii_df(spark)
    counts = pii_counts("text")
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *[c.alias(k) for k, c in counts.items()]
        ).collect()
    }
    assert got[1]["email"] == 2 and got[1]["phone"] == 0
    assert got[2]["phone"] == 2 and got[2]["email"] == 0
    assert got[3]["ipv4"] == 2
    assert got[4]["ssn"] == 1
    assert all(got[5][k] == 0 for k in PII_PATTERNS)
    assert all(got[6][k] == 0 for k in PII_PATTERNS)


def test_pii_redaction_replaces_all_and_only_pii(spark):
    df = _pii_df(spark)
    got = {r["doc_id"]: r["red"] for r in df.select(
        "doc_id", pii_redact("text").alias("red")).collect()}
    assert got[1] == "contact [EMAIL] or [EMAIL] today"
    assert got[2] == "call [PHONE] or [PHONE] now"
    assert got[3] == "server at [IP] and [IP] responded"
    assert got[4] == "ssn [SSN] leaked"
    assert got[5] == "clean text with no identifiers at all"


def test_x30_fixture_is_pii_free_and_passthrough(spark):
    out = x30_pii_scan(spark, SF_DIR)
    agg = out.agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_phones").alias("p"),
        F.sum("n_ips").alias("i"),
        F.sum("n_ssns").alias("s"),
        F.sum(F.when(F.col("has_pii"), 1).otherwise(0)).alias("flagged"),
    ).collect()[0]
    assert (agg["e"], agg["p"], agg["i"], agg["s"], agg["flagged"]) == (0, 0, 0, 0, 0)


def test_repetition_metrics_on_constructed_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # one token repeated: max repetition
            (2, "a b c d e f g h i j"),  # all distinct
            (3, "x"),  # too short for any n-gram
        ],
        ["doc_id", "text"],
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import quality

    orig = quality.load_table
    quality.load_table = lambda spark, name, sf_dir, **kw: df
    try:
        got = {r["doc_id"]: r for r in
               x29_repetition_filters(spark, "ignored").collect()}
    finally:
        quality.load_table = orig
    assert got[1]["dup_token_frac"] == 0.75
    assert got[1]["top_token_frac"] == 1.0
    assert got[1]["dup_2gram_frac"] == 0.666667  # 3 bigrams, 1 distinct (scale-6)
    assert not got[1]["keep_repetition"]
    assert got[2]["dup_token_frac"] == 0.0
    assert got[2]["top_token_frac"] == 0.1
    assert got[2]["dup_2gram_frac"] == 0.0
    assert got[2]["keep_repetition"]
    assert got[3]["dup_2gram_frac"] == 0.0 and got[3]["dup_3gram_frac"] == 0.0


def test_contamination_known_answer(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 3-grams with bench
            (2, "totally unrelated words here now"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox leaps")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in
           contamination_check(train, bench, n=3).collect()}
    # doc 1: 3-grams {the quick brown, quick brown fox, brown fox jumps};
    # bench has the first two
    assert got[1]["total_ngrams"] == 3 and got[1]["contam_ngrams"] == 2
    assert got[1]["contaminated"]
    assert got[2]["contam_ngrams"] == 0 and not got[2]["contaminated"]


def test_x31_benchmark_docs_excluded_from_output(spark):
    out = x31_contamination(spark, SF_DIR)
    n_bench_rows = out.where(
        F.col("doc_id") % CONTAM_BENCH_MOD == 0
    ).count()
    assert n_bench_rows == 0
    # the held-out slice must contaminate at least one training doc on
    # the word-salad fixture (tiny vocabulary → shared 3-grams)
    assert out.agg(F.sum("contam_ngrams")).collect()[0][0] > 0


def test_contamination_plan_broadcasts_bench_side(spark):
    out = x31_contamination(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the per-doc count agg is the only exchange over the train side
    assert plan.count("Exchange hashpartitioning") <= 2


def test_passage_dedup_known_answer(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        passage_dedup,
    )

    # w=3 passages; doc 1 and doc 2 share the passage "a b c" exactly;
    # doc 3 is disjoint; doc 4 is too short for any passage
    df = spark.createDataFrame(
        [
            (1, "a b c d"),   # passages: "a b c", "b c d"
            (2, "z a b c"),   # passages: "z a b", "a b c"
            (3, "p q r s"),   # disjoint
            (4, "x y"),       # no 3-token passage
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in passage_dedup(df, w=3).collect()}
    assert got[1]["n_passages"] == 2 and got[1]["n_shared_passages"] == 1
    assert got[1]["shared_passage_frac"] == 0.5
    assert not got[1]["keep_passage"]  # 0.5 is not < 0.5
    assert got[2]["n_shared_passages"] == 1
    assert got[3]["n_shared_passages"] == 0 and got[3]["keep_passage"]
    assert got[4]["n_passages"] == 0
    assert got[4]["shared_passage_frac"] == 0.0 and got[4]["keep_passage"]


def test_passage_dedup_repeat_within_one_doc_not_shared(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        passage_dedup,
    )

    # the passage "a b c" occurs twice inside doc 1 but in no other doc:
    # cross-doc dedup must NOT flag it (per-doc distinct before the
    # passage-key groupBy)
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "q r s t")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in passage_dedup(df, w=3).collect()}
    assert got[1]["n_shared_passages"] == 0 and got[1]["keep_passage"]


def test_x40_fixture_bimodal_and_every_doc_present(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x40_passage_dedup,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    out = x40_passage_dedup(spark, SF_DIR).cache()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert out.count() == n_docs  # short docs included with 0 passages
    kept = out.where("keep_passage").count()
    assert 0 < kept < n_docs  # replica docs dropped, the rest kept
    out.unpersist()


def test_x40_plan_one_scan_two_key_exchanges(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x40_passage_dedup,
    )

    plan = (
        x40_passage_dedup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one corpus scan (explode_outer keeps short docs — no docs rejoin)
    assert plan.count("Scan parquet") == 1
    # passage-key window + per-doc agg; anything more is a regression
    assert plan.count("Exchange hashpartitioning") <= 2


def test_lm_quality_known_answer(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        lm_quality,
    )

    # counts over docs 1-2: a=3, b=1, c=1, total=5; vocab_size=2 keeps
    # a and b (cnt DESC, token ASC), so c is OOV and scores at the
    # aggregate <unk> mass (total - in-vocab = 1) — same bits as b:
    # -log2(1/5)
    df = spark.createDataFrame(
        [(1, "a A b"), (2, "a c"), (3, ""), (4, None)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in lm_quality(df, vocab_size=2, keep_lo=1.0, keep_hi=1.4)
        .collect()
    }
    import math

    b_a = -math.log2(3 / 5)
    b_oov = -math.log2(1 / 5)
    # casefold binds: doc 1's "A" counts as "a"
    assert got[1]["n_tokens"] == 3 and got[1]["oov_frac"] == 0.0
    assert abs(got[1]["bits_per_token"] - round((2 * b_a + b_oov) / 3, 6)) < 1e-9
    assert got[1]["keep_lm"]  # 1.265 in [1.0, 1.4]
    assert got[2]["n_tokens"] == 2 and got[2]["oov_frac"] == 0.5
    assert abs(got[2]["bits_per_token"] - round((b_a + b_oov) / 2, 6)) < 1e-9
    assert not got[2]["keep_lm"]  # 1.529 above the band
    # token-less docs stay in the output with NULL metrics, keep false
    for d in (3, 4):
        assert got[d]["n_tokens"] == 0
        assert got[d]["oov_frac"] is None
        assert got[d]["bits_per_token"] is None
        assert got[d]["keep_lm"] is False


def test_x42_fixture_all_docs_present_both_outcomes(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x42_lm_quality,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    out = x42_lm_quality(spark, SF_DIR).cache()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert out.count() == n_docs
    kept = out.where("keep_lm").count()
    assert 0 < kept < n_docs  # the band actually binds on the fixture
    out.unpersist()


def test_x42_plan_broadcast_lm_no_global_sort(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x42_lm_quality,
    )

    plan = (
        x42_lm_quality(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the LM table reaches the scoring scan as a broadcast, never a
    # shuffle join
    assert "BroadcastHashJoin" in plan
    # the token-count table is checkpointed, so the scoring plan scans
    # the corpus exactly once (the LM-training scan ran in the
    # checkpoint job); a second parquet scan means the pin regressed
    assert plan.count("Scan parquet") == 1
    # keyed exchanges: doc_id agg (the ONLY corpus-scale one) + the
    # rank windows and the <unk>-mass agg, all over the tiny
    # checkpointed distinct-token table; more means a docs-side rejoin
    # or a shuffle join sneaked back in
    assert plan.count("Exchange hashpartitioning") <= 5


def test_x43_funnel_self_consistent_with_gates(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x29_repetition_filters,
        x43_corpus_funnel,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    rows = {
        r["stage_idx"]: r
        for r in x43_corpus_funnel(spark, SF_DIR).collect()
    }
    assert [rows[i]["stage"] for i in (1, 2, 3)] == [
        "repetition",
        "passage_dedup",
        "lm_quality",
    ]
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert rows[1]["rows_in"] == n_docs
    # stages chain: stage k's intake is stage k-1's survivors
    assert rows[2]["rows_in"] == rows[1]["rows_out"]
    assert rows[3]["rows_in"] == rows[2]["rows_out"]
    for i in (1, 2, 3):
        assert 0 <= rows[i]["rows_out"] <= rows[i]["rows_in"]
    # stage 1 agrees with the standalone x29 gate
    kept_rep = (
        x29_repetition_filters(spark, SF_DIR)
        .where("keep_repetition")
        .count()
    )
    assert rows[1]["rows_out"] == kept_rep


def test_lm_quality_invariant_under_corpus_doubling(spark):
    """Unigram-LM scores depend only on RELATIVE token frequencies:
    replicating the whole corpus doubles every count and the total, so
    every probability — and every doc's bits/token — is unchanged.
    This is exactly what the aggregate-<unk>-mass OOV treatment buys:
    the count-1 floor this replaced FAILED here, adding oov_frac bits
    per corpus doubling (p_oov = 1/total is an absolute count)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        lm_quality,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b c a", "d e a", "f g h i j k", "a a a", "z z q"]
        )],
        ["doc_id", "text"],
    )
    doubled = df.union(
        df.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    )
    base = {
        r["doc_id"]: (r["bits_per_token"], r["oov_frac"], r["keep_lm"])
        for r in lm_quality(df, vocab_size=4).collect()
    }
    twice = {
        r["doc_id"] % 100: (r["bits_per_token"], r["oov_frac"], r["keep_lm"])
        for r in lm_quality(doubled, vocab_size=4).collect()
    }
    assert base == twice


def test_st07_streaming_gate_equals_batch_scoring(spark):
    """Union of micro-batch scores against the frozen LM == one-shot
    batch scoring (the doc verdict depends only on its own tokens and
    the persisted model)."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        st07_streaming_lm_gate,
        x42_lm_quality,
    )

    cols = ["n_tokens", "oov_frac", "bits_per_token", "keep_lm"]
    batch = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in x42_lm_quality(spark, SF_DIR).collect()
    }
    stream = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in st07_streaming_lm_gate(spark, SF_DIR).collect()
    }
    assert batch == stream


def test_bigram_lm_known_answer(spark):
    import math

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        score_bigram_lm,
        train_bigram_lm,
        train_lm,
    )

    # unigrams: a=3 b=3 c=1 x=1, total 8; bigram counts: "a b"=3,
    # "b a"=1, "b c"=1; top_b=2 keeps "a b" (s=3/3) and "b a" (s=1/3,
    # tie vs "b c" broken by g ASC); "b c" takes the backoff path:
    # 0.4 * p(c) = 0.4/8
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b"), (3, "x"), (4, "")],
        ["doc_id", "text"],
    )
    big = train_bigram_lm(df, top_b=2)
    vocab, stats = train_lm(df)
    got = {
        r["doc_id"]: r for r in score_bigram_lm(df, big, vocab, stats).collect()
    }
    assert got[1]["n_transitions"] == 4
    assert got[1]["backoff_frac"] == 0.25
    exp = (0.0 + math.log2(3) + 0.0 + -math.log2(0.4 / 8)) / 4
    assert abs(got[1]["bits_per_transition"] - round(exp, 6)) < 1e-9
    assert got[2]["n_transitions"] == 1
    assert got[2]["backoff_frac"] == 0.0
    assert got[2]["bits_per_transition"] == 0.0  # s("a b")=3/3=1 → 0 bits
    # <2-token docs keep their row with NULL metrics (x42 contract)
    for d in (3, 4):
        assert got[d]["n_transitions"] == 0
        assert got[d]["backoff_frac"] is None
        assert got[d]["bits_per_transition"] is None


def test_x45_fixture_backoff_binds_both_ways(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x45_bigram_lm,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    out = x45_bigram_lm(spark, SF_DIR).cache()
    n_docs = load_table(spark, "documents", SF_DIR).count()
    assert out.count() == n_docs
    agg = out.where("n_transitions > 0").agg(
        F.min("backoff_frac").alias("lo"), F.max("backoff_frac").alias("hi")
    ).collect()[0]
    # the top-48 cap binds: some transitions score in-table, most back
    # off — neither path is degenerate on the fixture
    assert agg["lo"] < 1.0 and agg["hi"] > 0.0
    out.unpersist()


def _docs_dir(spark, tmp_path, rows):
    d = str(tmp_path / "docs_sf")
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t or "")) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(d + "/documents.parquet")
    return d


def test_script_mix_known_answer(spark, tmp_path):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x48_script_mix,
    )

    rows = [
        (1, "hello world"),                    # pure latin
        (2, "привет мир"),                     # pure cyrillic
        (3, "hello привет"),                   # mixed latin+cyrillic
        (4, "你好世界"),                        # pure cjk
        (5, "mixed 世界 and ελληνικά وعربى"),  # 4 scripts
        (6, "12345 !!! ..."),                  # no script at all
        (7, None),                             # NULL text ≡ ''
    ]
    d = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in x48_script_mix(spark, d).collect()}
    assert (got[1]["dominant_script"], got[1]["is_mixed"]) == ("latin", False)
    assert (got[2]["dominant_script"], got[2]["n_cyrillic"]) == ("cyrillic", 9)
    assert got[3]["is_mixed"] and got[3]["n_scripts"] == 2
    assert (got[4]["dominant_script"], got[4]["n_cjk"]) == ("cjk", 4)
    assert got[5]["n_scripts"] == 4 and got[5]["is_mixed"]
    assert (got[6]["dominant_script"], got[6]["n_scripts"]) == ("none", 0)
    assert (got[7]["dominant_script"], got[7]["is_mixed"]) == ("none", False)


def test_script_mix_matches_oracle_on_hostile_text(spark, tmp_path, duck):
    """Differential check on text the fixtures never carry: the five
    range regexes must count identically in Java regex and RE2."""
    import duckdb

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        _x48_sql,
        x48_script_mix,
    )
    from tests.oracle_compare import compare

    rows = [
        (1, "Ωμέγα και ω"),
        (2, "كتاب عربي 123 abc"),
        (3, "日本語テキスト 漢字"),   # kana NOT in the CJK-ideograph range
        (4, "ёЁђѕ АБВ xyz"),
        (5, "ЀӿͰϿ؀ۿ一鿿"),  # range edges
    ]
    d = _docs_dir(spark, tmp_path, rows)
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"  # Spark writes a directory
    )
    compare(x48_script_mix(spark, d), con.sql(_x48_sql()))


def test_zipf_fit_known_answer(spark, tmp_path):
    """Exact-frequency corpus: token i appears c_i times; the OLS fit
    over (ln rank, ln cnt) recomputed in Python must match."""
    import math

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        x49_zipf_fit,
    )

    freqs = {"alpha": 16, "beta": 8, "gamma": 4, "delta": 2, "eps": 1}
    text = " ".join(" ".join([w] * c) for w, c in freqs.items())
    d = _docs_dir(spark, tmp_path, [(1, text)])
    row = x49_zipf_fit(spark, d).collect()[0]
    pts = [
        (math.log(r + 1), math.log(c))
        for r, c in enumerate(sorted(freqs.values(), reverse=True))
    ]
    n = float(len(pts))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert row["n_top_tokens"] == 5
    assert abs(row["zipf_slope"] - slope) < 1e-6
    assert abs(row["zipf_intercept"] - intercept) < 1e-6
    # this geometric corpus is exactly Zipf-like in log2: slope of
    # ln(cnt) vs ln(rank) is negative and steep
    assert row["zipf_slope"] < -1.0


def test_duplicate_spans_known_answer(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        duplicate_spans,
    )

    # w=3 windows.  doc 1 and doc 2 share "a b c", "b c d" and "d e f";
    # "c d e" is doc 1-only and "x x x" repeats WITHIN doc 2 only (within-
    # doc repetition must not flag — cross-doc means min(doc)!=max(doc)).
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x x x x d e f"),
            (3, "p q r s"),
            (4, "x y"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicate_spans(df, w=3).collect()}
    # doc 1: dup starts {1,2,4}; 2-4 overlaps 1-3 (gap 1) and 4-6 abuts
    # at gap w-1=2 -> ONE merged span [1..6] covering the whole doc
    assert got[1]["n_tokens"] == 6
    assert got[1]["dup_spans"] == 1
    assert got[1]["dup_tokens"] == 6
    assert got[1]["max_span_tokens"] == 6
    assert got[1]["dup_frac"] == 1.0
    # doc 2: dup starts {1,2,9}; gap 9-2=7 > w-1 -> two spans,
    # [1..4] (len 4) and [9..11] (len 3); the twice-occurring "x x x"
    # at starts 5 and 6 is within-doc only and contributes nothing
    assert got[2]["n_tokens"] == 11
    assert got[2]["dup_spans"] == 2
    assert got[2]["dup_tokens"] == 7
    assert got[2]["max_span_tokens"] == 4
    assert got[2]["dup_frac"] == round(7 / 11, 6)
    # doc 3 disjoint, doc 4 too short for any window, doc 5 NULL text
    for d, nt in ((3, 4), (4, 2), (5, 0)):
        assert got[d]["n_tokens"] == nt
        assert got[d]["dup_spans"] == 0
        assert got[d]["dup_tokens"] == 0
        assert got[d]["max_span_tokens"] == 0
        assert got[d]["dup_frac"] == 0.0


def test_duplicate_spans_split_at_gap_w(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        duplicate_spans,
    )

    # dup starts {1, 4} with w=3: gap 3 > w-1 -> intervals [1..3] and
    # [4..6] touch but do not overlap as token ranges -> they still
    # merge into neither (gap > w-1 is the split rule; coverage is the
    # union either way, but the span COUNT distinguishes them)
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c z z z d e f")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicate_spans(df, w=3).collect()}
    # doc 1: "a b c" (start 1) and "d e f" (start 4) shared; "b c d",
    # "c d e" doc 1-only -> spans [1..3], [4..6]: 2 spans, 6 tokens
    assert got[1]["dup_spans"] == 2
    assert got[1]["dup_tokens"] == 6
    assert got[1]["max_span_tokens"] == 3
    assert got[1]["dup_frac"] == 1.0
    # doc 2: starts {1, 7} -> [1..3], [7..9]
    assert got[2]["dup_spans"] == 2
    assert got[2]["dup_tokens"] == 6
    assert got[2]["max_span_tokens"] == 3


def test_span_cut_text_known_answer(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        span_cut_text,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d x x x x d e f"),
            (3, "p q r s"),
            (4, "x y"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in span_cut_text(df, w=3).collect()}
    # doc 1 is fully covered by the merged span [1..6] -> empty output
    assert got[1]["clean_text"] == "" and got[1]["removed_tokens"] == 6
    # doc 2: spans [1..4] and [9..11] cut; kept positions 5..8
    assert got[2]["clean_text"] == "x x x x"
    assert got[2]["removed_tokens"] == 7 and got[2]["n_tokens"] == 11
    # untouched docs come back whitespace-normalized but verbatim
    assert got[3]["clean_text"] == "p q r s" and got[3]["removed_tokens"] == 0
    assert got[4]["clean_text"] == "x y"
    # NULL text ≡ empty text: row kept, empty output
    assert got[5]["clean_text"] == "" and got[5]["n_tokens"] == 0


def test_span_cut_removed_equals_duplicate_spans_coverage(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        duplicate_spans,
        span_cut_text,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    # cross-operator invariant: the tokens x69 cuts are exactly the
    # interval-union coverage x68 counts (same windows, same merge rule)
    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    a = {r["doc_id"]: r["dup_tokens"] for r in duplicate_spans(docs).collect()}
    b = {
        r["doc_id"]: r["removed_tokens"] for r in span_cut_text(docs).collect()
    }
    assert a == b and len(a) > 0
