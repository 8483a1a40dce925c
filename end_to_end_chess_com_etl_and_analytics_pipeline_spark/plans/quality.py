"""Training-data quality gates: repetition filters, PII scan, benchmark
contamination (driver contract part 3).

The first-class corpus-hygiene operators a 100 TB LLM-training-data
pipeline runs before anything else touches the text:

- x29: Gopher-style repetition filters (Rae et al. 2021 §A1.1), adapted
  word-level because the fixture documents are single-line — duplicate
  token fraction, most-frequent-token fraction, duplicate 2-/3-gram
  fractions, and a composite keep flag.
- x30: PII detection + redaction — email / phone / IPv4 / SSN regex
  counts and a deterministically-ordered redaction chain.
- x31: benchmark-contamination check (GPT-3 appendix C style): n-gram
  overlap of every training document against a held-out benchmark set.
- x40: cross-document exact passage dedup (Lee et al. 2022 style,
  fixed-width token windows).
- x42: unigram-LM perplexity quality gate (CCNet, Wenzek et al. 2020,
  adapted unigram): corpus-trained LM, per-doc bits/token, keep band.
- x45: bigram stupid-backoff scoring (Brants et al. 2007): top-B
  bigram conditionals with x42's capped unigram as the backoff.
- x43: the hygiene funnel — the gates chained with per-stage attrition.

Scale notes (the 100 TB shape):
- x29/x30 are single-scan codegen projections: no shuffle, no UDF, no
  driver materialization.  Filters compose with any downstream plan.
- x31 is ONE shuffle: per-doc distinct n-grams are built array-side in
  the projection (array_distinct, zero shuffle), the benchmark n-gram
  set — test sets are small by construction — is broadcast, and the
  only exchange is the per-doc count aggregation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed, round_fixed_sql
from ..functions.text import tokens
from ..sources.tables import load_table, read_parquet_noinfer

# whitespace tokenization with empties dropped — single-sourced next to
# its Spark twin (functions.text.tokens)
from ..functions.text import TOKS_SQL as _TOKS_SQL  # noqa: E402

# repetition keep-flag thresholds (chosen at fixture quartiles so both
# outcomes occur; the *filter mechanics* are the operator under test)
REP_TOP_TOKEN_MAX = 0.10
REP_DUP_2GRAM_MAX = 0.05


def _ngrams(toks, total, n: int):
    """Plain word n-grams as an array column; empty when total < n.

    NOT word_shingles: repetition metrics must see zero n-grams for
    short docs, not the whole-text fallback shingle.  The explicit
    when-guard matters — Spark sequence(1, 0) yields a DESCENDING
    [1, 0], not an empty array."""
    return F.when(
        total >= n,
        F.transform(
            F.sequence(F.lit(1), total - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def x29_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-level repetition quality gate (Gopher §A1.1 adapted).

    One staged projection: tokens once, n-gram arrays derived from them,
    every fraction scale-6 rounded (functions.rounding contract).  The
    most-frequent-token count is an O(distinct·n) array fold per row —
    still scan-local, no shuffle anywhere.

    NULL text ≡ empty text (analysis-family contract): the row stays,
    all fractions 0.0, keep flag true — matching the oracle's
    coalesce."""
    docs = load_table(spark, "documents", sf_dir).withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    staged = docs.select(
        "doc_id", tokens("text").alias("__toks")
    ).select(
        "doc_id",
        "__toks",
        F.size("__toks").alias("__n"),
        F.size(F.array_distinct("__toks")).alias("__nd"),
        _ngrams(F.col("__toks"), F.size("__toks"), 2).alias("__g2"),
        _ngrams(F.col("__toks"), F.size("__toks"), 3).alias("__g3"),
    )
    n = F.col("__n").cast("double")
    top_cnt = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct("__toks"),
                lambda d: F.size(F.filter(F.col("__toks"), lambda t: t == d)),
            )
        ),
        F.lit(0),
    )

    def _dup_frac(g) -> F.Column:
        return F.when(F.size(g) == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - F.size(F.array_distinct(g)).cast("double") / F.size(g)
        )

    top_frac = F.when(F.col("__n") == 0, F.lit(0.0)).otherwise(
        top_cnt.cast("double") / n
    )
    dup_tok = F.when(F.col("__n") == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.col("__nd").cast("double") / n
    )
    dup2 = _dup_frac(F.col("__g2"))
    dup3 = _dup_frac(F.col("__g3"))
    return staged.select(
        "doc_id",
        F.col("__n").alias("rep_n_tokens"),
        round_fixed(dup_tok, 6).alias("dup_token_frac"),
        round_fixed(top_frac, 6).alias("top_token_frac"),
        round_fixed(dup2, 6).alias("dup_2gram_frac"),
        round_fixed(dup3, 6).alias("dup_3gram_frac"),
        (
            (round_fixed(top_frac, 6) <= REP_TOP_TOKEN_MAX)
            & (round_fixed(dup2, 6) <= REP_DUP_2GRAM_MAX)
        ).alias("keep_repetition"),
    )


def _ngrams_sql(n: int) -> str:
    """DuckDB twin of _ngrams over a token-list column ``w``."""
    return (
        f"list_transform(range(1, CAST(len(w) AS BIGINT) - {n - 2}),"
        f" i -> array_to_string(w[CAST(i AS INTEGER):CAST(i + {n - 1} AS INTEGER)], ' '))"
    )


def _dup_frac_sql(g: str) -> str:
    return (
        f"CASE WHEN len({g}) = 0 THEN 0.0"
        f" ELSE 1.0 - CAST(len(list_distinct({g})) AS DOUBLE) / len({g}) END"
    )


_X29_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c="coalesce(text, '')")} AS w FROM documents),
staged AS (
    SELECT doc_id, w, len(w) AS n, len(list_distinct(w)) AS nd,
           {_ngrams_sql(2)} AS g2,
           {_ngrams_sql(3)} AS g3,
           coalesce(list_max(list_transform(list_distinct(w),
               d -> len(list_filter(w, t -> t = d)))), 0) AS top_cnt
    FROM toks)
SELECT doc_id,
       CAST(n AS INTEGER) AS rep_n_tokens,
       {round_fixed_sql("CASE WHEN n = 0 THEN 0.0 ELSE 1.0 - CAST(nd AS DOUBLE) / n END", 6)} AS dup_token_frac,
       {round_fixed_sql("CASE WHEN n = 0 THEN 0.0 ELSE CAST(top_cnt AS DOUBLE) / n END", 6)} AS top_token_frac,
       {round_fixed_sql(_dup_frac_sql("g2"), 6)} AS dup_2gram_frac,
       {round_fixed_sql(_dup_frac_sql("g3"), 6)} AS dup_3gram_frac,
       ({round_fixed_sql("CASE WHEN n = 0 THEN 0.0 ELSE CAST(top_cnt AS DOUBLE) / n END", 6)} <= {REP_TOP_TOKEN_MAX}
        AND {round_fixed_sql(_dup_frac_sql("g2"), 6)} <= {REP_DUP_2GRAM_MAX}) AS keep_repetition
FROM staged
"""


# PII patterns: RE2 ∩ Java-regex common dialect (no lookaround, no
# backrefs) so Spark and DuckDB compile the identical expression.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"(\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
}
# redaction applies in PII_PATTERNS order: email before the numeric
# patterns, SSN/IPv4 before the looser phone pattern — the chain is
# identical in both engines, so order changes never break parity.
PII_TOKENS: dict[str, str] = {
    "email": "[EMAIL]",
    "ssn": "[SSN]",
    "ipv4": "[IP]",
    "phone": "[PHONE]",
}


def pii_counts(text) -> dict[str, F.Column]:
    """Per-kind PII match counts (JVM regex, zero-shuffle projection)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for kind, pat in PII_PATTERNS.items()
    }


def pii_redact(text) -> F.Column:
    """Deterministic redaction chain over PII_PATTERNS order."""
    c = F.col(text) if isinstance(text, str) else text
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, PII_TOKENS[kind])
    return c


def x30_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan + redaction over documents.

    The fixture corpus is deliberately PII-free, so the driver oracle
    pins the all-zero counts AND byte-identical redaction pass-through;
    tests/test_quality.py proves detection/redaction on synthetic PII.
    Single scan-local projection — composes with any downstream write."""
    docs = load_table(spark, "documents", sf_dir, spread=False)
    counts = pii_counts("text")
    n_total = None
    for c in counts.values():
        n_total = c if n_total is None else n_total + c
    return docs.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ipv4"].alias("n_ips"),
        counts["ssn"].alias("n_ssns"),
        (n_total > 0).alias("has_pii"),
        pii_redact("text").alias("redacted"),
    )


def _pii_count_sql(kind: str) -> str:
    return f"len(regexp_extract_all(text, '{PII_PATTERNS[kind]}'))"


def _pii_redact_sql() -> str:
    expr = "text"
    for kind, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '{PII_TOKENS[kind]}', 'g')"
    return expr


_X30_SQL = f"""
SELECT doc_id,
       CAST({_pii_count_sql('email')} AS INTEGER) AS n_emails,
       CAST({_pii_count_sql('phone')} AS INTEGER) AS n_phones,
       CAST({_pii_count_sql('ipv4')} AS INTEGER) AS n_ips,
       CAST({_pii_count_sql('ssn')} AS INTEGER) AS n_ssns,
       ({_pii_count_sql('email')} + {_pii_count_sql('phone')}
        + {_pii_count_sql('ipv4')} + {_pii_count_sql('ssn')}) > 0 AS has_pii,
       {_pii_redact_sql()} AS redacted
FROM documents
"""


# contamination geometry: n-gram size, benchmark selector, flag cutoff
CONTAM_NGRAM = 3
CONTAM_BENCH_MOD = 37  # fixture "benchmark set" = doc_id % 37 == 0
CONTAM_FLAG_FRAC = 0.05


def contamination_check(
    docs: DataFrame,
    bench_docs: DataFrame,
    n: int = CONTAM_NGRAM,
    flag_frac: float = CONTAM_FLAG_FRAC,
) -> DataFrame:
    """Benchmark n-gram contamination for every training document.

    Shape at 100 TB: per-doc DISTINCT n-grams are computed array-side
    (array_distinct inside the projection — no explode-then-distinct
    shuffle), the benchmark n-gram set is broadcast (benchmark suites
    are tiny by construction), and the left broadcast join + per-doc
    count is the single exchange in the plan."""

    def _doc_ngrams(d: DataFrame) -> DataFrame:
        toks = tokens("text")
        return d.select(
            "doc_id",
            F.explode(
                F.array_distinct(_ngrams(toks, F.size(toks), n))
            ).alias("g"),
        )

    bench_ngrams = bench_docs.select(
        F.explode(F.array_distinct(_ngrams(tokens("text"), F.size(tokens("text")), n))).alias("g")
    ).distinct()
    hits = _doc_ngrams(docs).join(
        F.broadcast(bench_ngrams.withColumn("__hit", F.lit(1))), "g", "left"
    )
    frac = F.col("contam_ngrams").cast("double") / F.col("total_ngrams")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_ngrams"),
            F.count("__hit").alias("contam_ngrams"),
        )
        .select(
            "doc_id",
            "total_ngrams",
            "contam_ngrams",
            round_fixed(frac, 6).alias("contam_frac"),
            (frac >= flag_frac).alias("contaminated"),
        )
    )


def x31_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination of the fixture corpus against its own held-out
    doc_id % 37 == 0 slice (standing in for a benchmark test set).
    Docs too short for any n-gram drop out of both engines identically
    (no n-grams → no group)."""
    docs = load_table(spark, "documents", sf_dir)
    return contamination_check(
        docs.where(F.col("doc_id") % CONTAM_BENCH_MOD != 0),
        docs.where(F.col("doc_id") % CONTAM_BENCH_MOD == 0),
    )


_X31_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS w FROM documents),
ng AS (SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest({_ngrams_sql(CONTAM_NGRAM)}) AS g FROM toks)),
bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % {CONTAM_BENCH_MOD} = 0),
train AS (SELECT * FROM ng WHERE doc_id % {CONTAM_BENCH_MOD} <> 0)
SELECT t.doc_id,
       count(*) AS total_ngrams,
       count(b.g) AS contam_ngrams,
       {round_fixed_sql("CAST(count(b.g) AS DOUBLE) / count(*)", 6)} AS contam_frac,
       CAST(count(b.g) AS DOUBLE) / count(*) >= {CONTAM_FLAG_FRAC} AS contaminated
FROM train t LEFT JOIN bench b ON t.g = b.g
GROUP BY t.doc_id
"""


# passage-dedup geometry: window width (tokens) and the drop cutoff on
# the shared-passage fraction.  The fixture corpus is bimodal (exact
# replica docs share ~all passages, everything else shares none), so
# 0.5 separates the modes; production corpora tune this per-source.
PASSAGE_W = 8
PASSAGE_SHARED_MAX = 0.5


def passage_dedup(docs: DataFrame, w: int = PASSAGE_W,
                  shared_max: float = PASSAGE_SHARED_MAX) -> DataFrame:
    """Cross-document exact passage (w-token window) deduplication.

    The substring-level complement of doc-level dedup (x01/x13) and
    near-dup (x03/x14): a doc that copies a paragraph from another doc
    is caught here even when the documents as wholes are distinct
    (RefinedWeb / Lee et al. 2022 "Deduplicating Training Data Makes
    Language Models Better" run this as exact substring dedup; this is
    the groupBy formulation of the same predicate — no suffix array
    needed when the unit is a fixed w-token window).

    Per doc: every distinct w-token passage, flagged "shared" when it
    appears in ≥2 distinct documents; output is the per-doc passage
    count, shared count, shared fraction, and a keep flag.

    Shape at 100 TB: ONE corpus scan, and exactly two key-partitioned
    exchanges.  The passage arrays are built scan-side (array_distinct
    in the projection — per-doc dedup costs no shuffle);
    ``explode_outer`` keeps zero-passage docs alive so no docs-side
    rejoin is ever needed; the cross-doc repeat count is a COUNT window
    over the passage key (one exchange — a groupBy+join formulation
    would pay two more); the per-doc re-aggregation is the second.  No
    broadcast of corpus-sized state, no driver materialization.
    Passage-less rows (g NULL) get a per-doc sentinel partition key so
    the window exchange never concentrates every short doc in one
    partition.  The window keys on (is_null, xxhash64(passage)) rather
    than the passage string: WindowExec shuffles AND sorts its key, and
    8-byte longs shuffle and sort far cheaper than ~w-word strings
    (measured: 10× ratio 3.2 → ~2.1 on the scale probe, A/B'd against
    the string-keyed and groupBy+join formulations).  The hash never
    reaches the output, so oracle parity is unaffected short of a
    2^-64 collision (which would merge two window partitions,
    overcounting both)."""
    toks = tokens("text")
    from pyspark.sql import Window

    # the passage STRING never leaves the scan stage: it's hashed in the
    # same projection that explodes it, so the window exchange moves
    # (doc_id, has_g, key) — 17 bytes/row, not the ~w-word string
    sh = docs.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(_ngrams(toks, F.size(toks), w))
        ).alias("g"),
    ).select(
        "doc_id",
        F.col("g").isNotNull().alias("__has_g"),
        F.when(F.col("g").isNull(), F.col("doc_id")).otherwise(
            F.xxhash64("g")
        ).alias("__k"),
    )
    # sh is per-doc distinct, so the per-key row count == distinct doc
    # count; sum(has_g) skips the sentinel rows, which key on doc_id —
    # disjoint from real hashes via the boolean — so short docs spread
    # over partitions instead of piling into one
    one_if_real = F.when(F.col("__has_g"), F.lit(1)).otherwise(F.lit(0))
    w_g = Window.partitionBy("__has_g", "__k")
    marked = sh.withColumn("__docs", F.sum(one_if_real).over(w_g))
    agg = marked.groupBy("doc_id").agg(
        F.sum(one_if_real).alias("__n"),
        F.sum(
            F.when(
                F.col("__has_g") & (F.col("__docs") > 1), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("__ns"),
    )
    n = F.col("__n")
    ns = F.col("__ns")
    frac = F.when(n == 0, F.lit(0.0)).otherwise(
        ns.cast("double") / n.cast("double")
    )
    return agg.select(
        "doc_id",
        n.cast("int").alias("n_passages"),
        ns.cast("int").alias("n_shared_passages"),
        round_fixed(frac, 6).alias("shared_passage_frac"),
        (frac < shared_max).alias("keep_passage"),
    )


def x40_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """passage_dedup over the documents fixture (see passage_dedup)."""
    return passage_dedup(load_table(spark, "documents", sf_dir))


_X40_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id, unnest({_ngrams_sql(PASSAGE_W)}) AS g FROM toks)),
dup AS (SELECT g FROM sh GROUP BY g HAVING count(*) > 1),
agg AS (SELECT s.doc_id, count(*) AS n, count(d.g) AS ns
        FROM sh s LEFT JOIN dup d USING (g) GROUP BY s.doc_id)
SELECT docs.doc_id,
       CAST(coalesce(agg.n, 0) AS INTEGER) AS n_passages,
       CAST(coalesce(agg.ns, 0) AS INTEGER) AS n_shared_passages,
       {round_fixed_sql(
           "CASE WHEN coalesce(agg.n, 0) = 0 THEN 0.0"
           " ELSE CAST(coalesce(agg.ns, 0) AS DOUBLE) / agg.n END", 6)}
           AS shared_passage_frac,
       (CASE WHEN coalesce(agg.n, 0) = 0 THEN 0.0
             ELSE CAST(coalesce(agg.ns, 0) AS DOUBLE) / agg.n END)
           < {PASSAGE_SHARED_MAX} AS keep_passage
FROM documents docs LEFT JOIN agg ON docs.doc_id = agg.doc_id
"""


def _span_base(docs: DataFrame, w: int, with_nt: bool) -> DataFrame:
    """(doc_id[, __nt], pos, __has_g, __k): the ONE scan-side projection
    both span operators start from — positions 1-based, each w-token
    window hashed to an 8-byte key in the same projection (x40's
    lesson: the gram string never leaves the scan; short of a 2^-64
    xxhash64 collision — which would falsely mark both colliding grams
    duplicated — the hashed key's flag matches the oracle's
    string-keyed one), gram-less docs riding a per-doc sentinel key so
    there is no docs-side rejoin and no hot NULL partition.  Shared by
    :func:`duplicate_spans` and :func:`span_cut_text` so the two can
    never drift."""
    toks = tokens("text")
    total = F.size(toks)
    head = ["doc_id"] + ([total.alias("__nt")] if with_nt else [])
    keep = ["doc_id"] + (["__nt"] if with_nt else [])
    return docs.select(
        *head,
        F.posexplode_outer(_ngrams(toks, total, w)).alias("__i", "__g"),
    ).select(
        *keep,
        (F.col("__i") + 1).alias("pos"),
        F.col("__g").isNotNull().alias("__has_g"),
        F.when(F.col("__g").isNull(), F.col("doc_id")).otherwise(
            F.xxhash64("__g")
        ).alias("__k"),
    )


def _dup_flag_window(base: DataFrame) -> DataFrame:
    """Cross-doc duplication flag, WINDOW formulation: min(doc_id) ≠
    max(doc_id) over the gram-key window (O(1) window state — no
    COUNT(DISTINCT), no collect_set).  ONE occurrence-sized exchange
    that also sorts (WindowExec).  Wins when per-gram duplication is
    LOW and most grams are unique: the partial aggregation the aggjoin
    formulation leans on collapses nothing there, so its extra agg
    exchange buys nothing."""
    w_g = Window.partitionBy("__has_g", "__k")
    keep = [c for c in base.columns if c not in ("__has_g", "__k")]
    return base.select(
        *keep,
        (
            F.col("__has_g")
            & (F.min("doc_id").over(w_g) != F.max("doc_id").over(w_g))
        ).alias("__dup"),
    )


def _dup_flag_aggjoin(base: DataFrame) -> DataFrame:
    """Cross-doc duplication flag, PARTIAL-AGG/JOIN formulation:
    collapse (gram-key → min_doc, max_doc) through a map-side partial
    aggregation first — distinct grams ≪ occurrences when duplication
    is high — keep only keys with min ≠ max, and join that
    duplicated-key set back to the positions.  AQE broadcasts the set
    while it fits the bar, skipping the occurrence-sized exchange
    entirely; past the bar it degrades to a key-partitioned join whose
    big-side exchange is the one the window formulation pays anyway
    (minus its sort, plus the map-side-reduced agg exchange).

    MEASURED LOSER (r11 A/B, SCALE.md "Round 11: x68/x69 formulation
    A/B") — r10 predicted this formulation would win when per-gram
    duplication is high (the 1000× replica decade, where the window
    exchange went superlinear), but on the near-dup replica corpus the
    dup-key set ≈ ALL distinct grams (replicas duplicate everything),
    far over the broadcast bar, so the "self-gating" degradation is
    the common case: base exchange + agg exchange + join loses to the
    window's one exchange+sort at every measured corpus and scale
    (replica 100×/1000×, hotgram, unique — 0.57-1.06× speedup, i.e.
    mostly slowdown).  Kept as the measured alternative the probe
    re-times each round, NOT the default."""
    dup_keys = (
        base.where("__has_g")
        .groupBy("__k")
        .agg(F.min("doc_id").alias("__dmin"), F.max("doc_id").alias("__dmax"))
        .where(F.col("__dmin") != F.col("__dmax"))
        .select("__k", F.lit(True).alias("__dup_k"))
    )
    keep = [base[c] for c in base.columns if c not in ("__has_g", "__k")]
    return base.join(
        dup_keys, (base["__has_g"]) & (base["__k"] == dup_keys["__k"]), "left"
    ).select(
        *keep,
        F.coalesce(F.col("__dup_k"), F.lit(False)).alias("__dup"),
    )


def _dup_flag_saltagg(base: DataFrame, salts: int = 16) -> DataFrame:
    """Cross-doc duplication flag, SALTED TWO-STAGE AGG formulation
    (r11 verdict #7's skew experiment): stage 1 aggregates
    (gram-key, salt) → (min_doc, max_doc) with the salt spreading a
    hot gram's reduce rows over ``salts`` partitions (guide §2.5
    two-level aggregation); stage 2 merges the salted partials per key
    (min of mins / max of maxes — the same global extrema); the
    duplicated-key set then joins back to the positions exactly like
    :func:`_dup_flag_aggjoin`.  Identical output by construction.

    MEASURED LOSER (r12 A/B, SCALE.md "Round 12: x68/x69 salted
    aggregation") — kept behind the formulation switch as the measured
    alternative, NOT the default."""
    part = (
        base.where("__has_g")
        .groupBy(
            "__k",
            F.pmod(F.xxhash64("doc_id"), F.lit(int(salts))).alias("__salt"),
        )
        .agg(F.min("doc_id").alias("__pmin"), F.max("doc_id").alias("__pmax"))
    )
    dup_keys = (
        part.groupBy("__k")
        .agg(F.min("__pmin").alias("__dmin"), F.max("__pmax").alias("__dmax"))
        .where(F.col("__dmin") != F.col("__dmax"))
        .select("__k", F.lit(True).alias("__dup_k"))
    )
    keep = [base[c] for c in base.columns if c not in ("__has_g", "__k")]
    return base.join(
        dup_keys, (base["__has_g"]) & (base["__k"] == dup_keys["__k"]), "left"
    ).select(
        *keep,
        F.coalesce(F.col("__dup_k"), F.lit(False)).alias("__dup"),
    )


def _dup_flagged(base: DataFrame, formulation: str) -> DataFrame:
    """Dispatch to a duplication-flag formulation (identical output by
    construction; tools/x68_ab_probe.py asserts it and SCALE.md records
    the A/B timings that picked the default)."""
    if formulation == "window":
        return _dup_flag_window(base)
    if formulation == "aggjoin":
        return _dup_flag_aggjoin(base)
    if formulation == "saltagg":
        return _dup_flag_saltagg(base)
    raise ValueError(f"unknown dup-flag formulation: {formulation!r}")


def duplicate_spans(
    docs: DataFrame, w: int = PASSAGE_W, formulation: str = "window"
) -> DataFrame:
    """Position-aware duplicated-span coverage per document.

    The cutting complement of :func:`passage_dedup`: x40 answers *how
    much* of a document's distinct passage set is shared, this answers
    *where* — every w-token window that also occurs in another document
    is an interval [pos, pos+w-1], and overlapping intervals merge
    into spans (the exact-substring-dedup unit of Lee et al. 2022: the
    spans are what a trainer cuts or masks).  Two intervals that merely
    TOUCH (gap of exactly w between start positions) count as two
    spans: the split rule is gap > w-1, pinned by
    test_duplicate_spans_split_at_gap_w; dup_tokens/dup_frac are the
    interval-union coverage either way, so x69's cut is unaffected by
    the split convention.  Per doc: span count, duplicated-token
    coverage, longest span, and the covered fraction.

    Interval merge without a self-join: intervals all have length w, so
    with per-doc positions sorted ascending, a duplicated position
    starts a new span iff the previous duplicated position is > w-1
    back, and its marginal coverage is min(w, pos - prev_dup_pos)
    (null prev → w).  Both are one running-window expression — the
    classic gaps-and-islands formulation, identical in Spark and the
    DuckDB oracle.

    Shape at 100 TB: ONE corpus scan; the duplication flag is the
    ``formulation`` choice (:func:`_dup_flag_window`, the r11 A/B
    winner at every measured corpus/scale, vs the partial-agg/join
    alternative :func:`_dup_flag_aggjoin`); the islands windows
    exchange by doc_id; the (doc, island) and doc rollups reuse that
    partitioning (HashPartitioning(doc_id) satisfies both clusterings
    — no further exchange)."""
    flagged = _dup_flagged(_span_base(docs, w, with_nt=True), formulation)
    order = F.col("pos").asc_nulls_first()
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.max(F.when(F.col("__dup"), F.col("pos"))).over(w_prev)
    gap = F.col("pos") - prev
    seq = flagged.select(
        "doc_id",
        "__nt",
        "pos",
        (F.col("__dup") & (prev.isNull() | (gap > w - 1)))
        .cast("int")
        .alias("__st"),
        F.when(
            F.col("__dup"), F.least(F.lit(w), F.coalesce(gap, F.lit(w)))
        ).alias("__c"),
    ).withColumn("__isl", F.sum("__st").over(w_run))
    isl = seq.groupBy("doc_id", "__isl").agg(
        F.max("__nt").alias("__nt"),
        F.sum("__st").alias("__starts"),
        F.sum("__c").alias("__len"),
    )
    agg = isl.groupBy("doc_id").agg(
        F.max("__nt").alias("__nt"),
        F.sum("__starts").alias("__spans"),
        F.sum("__len").alias("__dtok"),
        F.max(F.when(F.col("__starts") > 0, F.col("__len"))).alias("__mx"),
    )
    nt = F.coalesce(F.col("__nt"), F.lit(0))
    dtok = F.coalesce(F.col("__dtok"), F.lit(0))
    frac = F.when(nt == 0, F.lit(0.0)).otherwise(
        dtok.cast("double") / nt.cast("double")
    )
    return agg.select(
        "doc_id",
        nt.cast("int").alias("n_tokens"),
        F.coalesce(F.col("__spans"), F.lit(0)).cast("int").alias("dup_spans"),
        dtok.cast("int").alias("dup_tokens"),
        F.coalesce(F.col("__mx"), F.lit(0)).cast("int").alias(
            "max_span_tokens"
        ),
        round_fixed(frac, 6).alias("dup_frac"),
    )


def x68_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duplicate_spans over the documents fixture (see duplicate_spans)."""
    return duplicate_spans(load_table(spark, "documents", sf_dir))


_X68_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS w FROM documents),
grams AS (
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.g AS g
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     range(1, coalesce(CAST(len(w) AS BIGINT), 0)
                              - {PASSAGE_W - 2}),
                     i -> {{'pos': i,
                            'g': array_to_string(
                                w[CAST(i AS INTEGER):
                                  CAST(i + {PASSAGE_W - 1} AS INTEGER)],
                                ' ')}})) AS u
          FROM toks)),
flagged AS (
    SELECT doc_id, pos,
           MIN(doc_id) OVER (PARTITION BY g)
               <> MAX(doc_id) OVER (PARTITION BY g) AS dup
    FROM grams),
seq AS (
    SELECT doc_id, pos, dup,
           MAX(CASE WHEN dup THEN pos END) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
    FROM flagged),
marked AS (
    SELECT doc_id, pos,
           CASE WHEN dup AND (prev IS NULL OR pos - prev > {PASSAGE_W - 1})
                THEN 1 ELSE 0 END AS st,
           CASE WHEN dup
                THEN LEAST({PASSAGE_W}, COALESCE(pos - prev, {PASSAGE_W}))
                END AS c
    FROM seq),
isl AS (
    SELECT doc_id, st, c,
           SUM(st) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM marked),
per_isl AS (
    SELECT doc_id, island, SUM(st) AS starts, SUM(c) AS len
    FROM isl GROUP BY doc_id, island),
agg AS (
    SELECT doc_id, SUM(starts) AS spans, SUM(len) AS dtok,
           MAX(CASE WHEN starts > 0 THEN len END) AS mx
    FROM per_isl GROUP BY doc_id)
SELECT toks.doc_id,
       CAST(coalesce(len(toks.w), 0) AS INTEGER) AS n_tokens,
       CAST(coalesce(agg.spans, 0) AS INTEGER) AS dup_spans,
       CAST(coalesce(agg.dtok, 0) AS INTEGER) AS dup_tokens,
       CAST(coalesce(agg.mx, 0) AS INTEGER) AS max_span_tokens,
       {round_fixed_sql(
           "CASE WHEN coalesce(len(toks.w), 0) = 0 THEN 0.0"
           " ELSE CAST(coalesce(agg.dtok, 0) AS DOUBLE) / len(toks.w) END",
           6)} AS dup_frac
FROM toks LEFT JOIN agg ON toks.doc_id = agg.doc_id
"""


def span_cut_text(
    docs: DataFrame, w: int = PASSAGE_W, formulation: str = "window"
) -> DataFrame:
    """The ACTION twin of :func:`duplicate_spans`: emit each document's
    text with every cross-doc duplicated span removed (what the trainer
    actually feeds the tokenizer after exact-substring dedup), plus the
    token accounting.  A token at position i is cut iff some duplicated
    window starts in [i-w+1, i] — exactly the interval-union coverage
    x68 counts, so ``removed_tokens`` here ≡ x68's ``dup_tokens`` (a
    free cross-operator invariant).

    Output text is whitespace-normalized (tokens re-joined with single
    spaces) — the stated contract; the cut is token-granular, not
    byte-granular.  NULL text ≡ empty text (row kept, empty output) per
    the family's NULL contract.

    Shape at 100 TB: dup-position detection is shared with x68
    (:func:`_span_base` + the ``formulation`` flag choice); the
    positions then COLLAPSE per doc (collect_list bounded by the doc's
    own token count — per-doc state, the same bound the token array
    itself has) and rejoin the corpus by doc_id.  The per-token cut is
    O(n + d·w) doc-local array work (r10 ADVICE: the previous
    per-token ``exists`` over all dup starts was O(n·d)): the covered
    position set is the flattened union of the d start intervals
    (≤ d·w elements, deduped), and the kept positions are one
    ``array_except`` hash-lookup pass over 1..n — no shuffle beyond
    the doc_id rejoin; no corpus-sized driver state anywhere."""
    toks = tokens("text")
    base = _span_base(docs, w, with_nt=False)
    dup_pos = (
        _dup_flagged(base, formulation)
        .where(F.col("__dup"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("__ps"))
    )
    joined = docs.select("doc_id", toks.alias("__w")).join(
        dup_pos, "doc_id", "left"
    )
    n = F.coalesce(F.size("__w"), F.lit(0))
    ps = F.coalesce(F.col("__ps"), F.array().cast("array<int>"))
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    covered = F.array_distinct(
        F.flatten(F.transform(ps, lambda p: F.sequence(p, p + F.lit(w - 1))))
    )
    keep_idx = F.array_except(idx, covered)
    return joined.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        (n - F.size(keep_idx)).cast("int").alias("removed_tokens"),
        F.array_join(
            F.transform(keep_idx, lambda i: F.element_at("__w", i)), " "
        ).alias("clean_text"),
    )


def x69_span_cut_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_cut_text over the documents fixture (see span_cut_text)."""
    return span_cut_text(load_table(spark, "documents", sf_dir))


_X69_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL.format(c='text')} AS w FROM documents),
grams AS (
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.g AS g
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     range(1, coalesce(CAST(len(w) AS BIGINT), 0)
                              - {PASSAGE_W - 2}),
                     i -> {{'pos': i,
                            'g': array_to_string(
                                w[CAST(i AS INTEGER):
                                  CAST(i + {PASSAGE_W - 1} AS INTEGER)],
                                ' ')}})) AS u
          FROM toks)),
flagged AS (
    SELECT doc_id, pos,
           MIN(doc_id) OVER (PARTITION BY g)
               <> MAX(doc_id) OVER (PARTITION BY g) AS dup
    FROM grams),
dps AS (
    SELECT doc_id, list(pos ORDER BY pos) AS ps
    FROM flagged WHERE dup GROUP BY doc_id),
final AS (
    SELECT toks.doc_id,
           coalesce(CAST(len(toks.w) AS BIGINT), 0) AS n,
           toks.w AS w,
           list_filter(
               range(1, coalesce(CAST(len(toks.w) AS BIGINT), 0) + 1),
               i -> len(list_filter(coalesce(dps.ps, CAST([] AS BIGINT[])),
                                    p -> p <= i
                                         AND i <= p + {PASSAGE_W - 1})) = 0
           ) AS keep_idx
    FROM toks LEFT JOIN dps ON toks.doc_id = dps.doc_id)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_tokens,
       CAST(n - len(keep_idx) AS INTEGER) AS removed_tokens,
       coalesce(array_to_string(
           list_transform(keep_idx, i -> w[CAST(i AS INTEGER)]),
           ' '), '') AS clean_text
FROM final
"""


# x42: unigram-LM quality gate geometry.  Vocab sized below the
# fixtures' distinct-token count so the <unk> path actually binds (same
# reasoning as x39's VOCAB_SIZE); the keep band brackets the fixture
# median bits/token (≈4.40 at both sf0.01 and sf0.1, observed
# 3.45–4.91) at roughly its 10th/90th percentiles so both outcomes
# occur.  Production runs set vocab to 10^4–10^5 and tune the band
# per-corpus (CCNet keeps the "middle" perplexity tercile).
LM_VOCAB = 24
LM_KEEP_LO = 4.2
LM_KEEP_HI = 4.6


def lm_quality(
    docs: DataFrame,
    vocab_size: int = LM_VOCAB,
    keep_lo: float = LM_KEEP_LO,
    keep_hi: float = LM_KEEP_HI,
) -> DataFrame:
    """CCNet-style language-model quality gate (Wenzek et al. 2020),
    adapted unigram: train a unigram LM on the corpus itself (top
    ``vocab_size`` casefolded tokens by frequency; every out-of-vocab
    token maps to one aggregate ``<unk>`` symbol whose probability is
    the total OOV mass / total — the standard vocab-capped treatment,
    and scale-invariant: replicating the corpus changes no score,
    which a count-1 floor would break by +oov_frac bits per doubling),
    score every document by its mean cross-entropy in bits/token, and
    keep documents inside a [keep_lo, keep_hi] band — abnormally low
    bits = boilerplate/repetitive text, abnormally high = noise the LM
    has never seen.  The standard corpus gate CCNet/RedPajama run with
    a KenLM 5-gram; the unigram adaptation keeps the operator
    self-contained (no external model artifact) with the identical
    plan shape — LM table join + per-doc mean.

    Shape at 100 TB: two corpus passes (the LM is trained on the same
    corpus it scores — CCNet's structure exactly), TWO corpus-scale
    key exchanges total, and a broadcast.  Pass 1: explode + hash-agg
    on token (map-side combined); the top-V cut is orderBy+limit →
    TakeOrderedAndProject (per-partition top-V, driver merges
    V·n_partitions rows — no global sort materialization; V is the
    model-vocab constant).  Pass 2: the LM
    table (V rows — 10^5 at production) broadcasts to a scan-side left
    join and the per-doc mean is one exchange on doc_id.
    ``explode_outer`` keeps token-less documents alive in pass 2 with
    no docs-side rejoin (contract: text analysis never drops rows); an
    empty doc has no defined perplexity, so its metrics are NULL — not
    0 — and keep_lm is explicitly false.

    Split as ``train_lm`` (pass 1 — the frozen model artifact) +
    ``score_lm`` (pass 2), so the streaming gate (st07) can score
    arriving batches against a persisted LM."""
    vocab, stats = train_lm(docs, vocab_size)
    return score_lm(docs, vocab, stats, keep_lo, keep_hi)


def _lm_tokens(docs: DataFrame) -> DataFrame:
    from ..functions.text import casefold

    return docs.select(
        "doc_id",
        F.explode_outer(
            tokens(casefold(F.coalesce(F.col("text"), F.lit(""))))
        ).alias("token"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Checkpointed (token, cnt) over the corpus — the shared pass-1
    input of train_lm and train_bigram_lm (x45 computes it once and
    hands it to both, saving a corpus scan)."""
    tok = _lm_tokens(docs)
    return (
        tok.where(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint()
    )


def train_lm(
    docs: DataFrame,
    vocab_size: int = LM_VOCAB,
    counts: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Pass 1 of lm_quality: the unigram LM as two small frames —
    ``vocab`` (token, cnt — the top-``vocab_size`` rows) and ``stats``
    (one row: __total token mass, __unk OOV mass).  Both are
    model-artifact-sized: persist them to parquet and any later batch
    or stream scores against the frozen model (see
    streaming.pipeline.streaming_lm_gate)."""
    # counts feeds two consumers (the top-V cut and the total); the
    # checkpoint in token_counts pins the distinct-token table —
    # vocab-sized, tiny next to the corpus — so the explode + token
    # agg runs ONCE instead of once per consumer
    if counts is None:
        counts = token_counts(docs)
    # top-V cut: orderBy+limit compiles to TakeOrderedAndProject —
    # per-partition top-V then a V·n_partitions driver merge, NO
    # global sort materialization at any scale (k is the model-vocab
    # constant).  (cnt DESC, token ASC) is a total order (tokens are
    # distinct), so the cut is deterministic.
    vocab = (
        counts.orderBy(F.desc("cnt"), F.asc("token"))
        .limit(vocab_size)
        .select("token", "cnt")
    )
    # one-row LM stats: total token mass and the aggregate <unk> mass
    # (total minus in-vocab mass) — p(<unk>) = __unk / __total, the
    # scale-invariant OOV probability
    stats = (
        counts.agg(F.sum("cnt").cast("double").alias("__total"))
        .crossJoin(
            vocab.agg(
                F.coalesce(F.sum("cnt"), F.lit(0))
                .cast("double")
                .alias("__vmass")
            )
        )
        .select(
            "__total",
            # floor the OOV mass at one pseudo-count: a fully-in-vocab
            # training corpus would give __unk = 0, and an unseen token
            # in a LATER batch scored against the frozen model (the
            # streaming_lm_gate use) would then hit -log2(0) — NULL in
            # Spark, -Infinity in DuckDB.  Laplace-style floor keeps
            # p(<unk>) > 0 always; a no-op whenever real OOV mass ≥ 1.
            F.greatest(
                F.col("__total") - F.col("__vmass"), F.lit(1.0)
            ).alias("__unk"),
        )
    )
    return vocab, stats


def score_lm(
    docs: DataFrame,
    vocab: DataFrame,
    stats: DataFrame,
    keep_lo: float = LM_KEEP_LO,
    keep_hi: float = LM_KEEP_HI,
) -> DataFrame:
    """Pass 2 of lm_quality: score ``docs`` against a frozen LM
    (``vocab``/``stats`` from train_lm, possibly re-read from
    parquet).  A doc's verdict depends only on its own tokens and the
    LM, so scoring a corpus in micro-batches and unioning equals
    scoring it in one shot — the streaming-gate oracle relies on
    this."""
    tok = _lm_tokens(docs)
    has_tok = F.col("token").isNotNull()
    scored = (
        tok.join(F.broadcast(vocab), "token", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            has_tok.alias("__has"),
            # NULL for the token-less sentinel row, so avg() sees an
            # empty set for empty docs and yields NULL, not 0
            F.when(
                has_tok,
                -F.log2(
                    F.coalesce(F.col("cnt").cast("double"), F.col("__unk"))
                    / F.col("__total")
                ),
            ).alias("__bits"),
            F.when(
                has_tok,
                F.when(F.col("cnt").isNull(), 1.0).otherwise(0.0),
            ).alias("__oov"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.when(F.col("__has"), 1).otherwise(0)).alias("__n"),
        F.avg("__oov").alias("__oov_frac"),
        F.avg("__bits").alias("__bits_avg"),
    )
    bits6 = round_fixed(F.col("__bits_avg"), 6)
    return agg.select(
        "doc_id",
        F.col("__n").cast("bigint").alias("n_tokens"),
        round_fixed(F.col("__oov_frac"), 6).alias("oov_frac"),
        bits6.alias("bits_per_token"),
        # band test on the ROUNDED value in both engines, so a
        # sub-1e-6 cross-engine float wobble can never flip the flag
        F.coalesce(bits6.between(keep_lo, keep_hi), F.lit(False)).alias(
            "keep_lm"
        ),
    )


def x42_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lm_quality over the documents fixture (see lm_quality)."""
    return lm_quality(load_table(spark, "documents", sf_dir))


# x45: bigram stupid-backoff geometry.  The bigram table is capped at
# the top-B pairs by count (same artifact-boundedness argument as
# x42's vocab: at production B is 10^6-ish and broadcastable; here it
# is sized WELL below the fixtures' ~900 distinct bigrams so the
# backoff path dominates and both scoring paths are exercised), and
# the backoff distribution is exactly x42's vocab-capped unigram LM.
BIGRAM_TOP_B = 48
BACKOFF_ALPHA = 0.4  # Brants et al. 2007's fixed backoff weight


def train_bigram_lm(
    docs: DataFrame,
    top_b: int = BIGRAM_TOP_B,
    counts: DataFrame | None = None,
    grams: DataFrame | None = None,
) -> DataFrame:
    """The bigram half of the stupid-backoff artifact: the top
    ``top_b`` bigrams by corpus count, each with its PRECOMPUTED
    conditional score s = cnt(w1 w2) / cnt(w1) — storing the
    conditional (not the raw count) means scoring never needs the full
    unigram table, only this capped frame.  Top-B cut via
    orderBy+limit → TakeOrderedAndProject: per-partition top-B then a
    B·n_partitions driver merge — no global sort materialization, no
    second pass over the bigram table.  (cnt DESC, g ASC) is a total
    order (bigram strings are distinct), so the cut is
    deterministic."""
    if counts is None:
        counts = token_counts(docs)
    uni = counts.withColumnRenamed("cnt", "ucnt")
    if grams is None:
        grams = _doc_bigrams(docs)
    bi = (
        grams.where(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    top = (
        bi.orderBy(F.desc("cnt"), F.asc("g"))
        .limit(top_b)
        .select(
            "g",
            F.substring_index(F.col("g"), " ", 1).alias("__w1"),
            "cnt",
        )
    )
    # broadcast the CAPPED side: top has ≤ top_b rows by construction,
    # while uni is the full unigram table whose distinct-token
    # cardinality is unbounded at corpus scale
    return F.broadcast(top).join(
        uni, top["__w1"] == uni["token"], "inner"
    ).select(
        "g",
        (F.col("cnt").cast("double") / F.col("ucnt")).alias("s_big"),
    )


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, g) with g = every ADJACENT token pair as a single
    space-joined string (all occurrences, NOT distinct — LM scoring
    weights repeated transitions); explode_outer keeps docs with <2
    tokens alive with g NULL.

    NOT _ngrams(toks, n, 2): higher-order functions run interpreted,
    and the per-position array_join(slice(...)) there costs ~11 µs per
    output element at volume (measured 30.8 s for 2.7M bigrams on 32
    cores).  Two O(n) shifted slices + one zip_with concat build the
    same strings in a single interpreted pass — measured ~7x faster —
    and the emitted pair strings are byte-identical, so the oracle SQL
    is unchanged."""
    from ..functions.text import casefold

    toks = tokens(casefold(F.coalesce(F.col("text"), F.lit(""))))
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.explode_outer(pairs).alias("g"))


def x45_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram stupid-backoff LM scoring (Brants et al. 2007): every
    adjacent token transition scores s = cnt(w1 w2)/cnt(w1) when the
    bigram is in the top-B table, else ALPHA times x42's vocab-capped
    unigram probability of w2 (aggregate-<unk> OOV mass) — the 5-gram
    KenLM gate's shape at order 2, fully cross-engine checkable.
    Output per doc: transition count, backoff fraction, mean bits per
    transition.  Docs with <2 tokens keep their row with NULL metrics
    (x42's NULL contract).

    Shape at 100 TB: training is two hash-aggs (bigram key + token
    key) with the top-B cut over the distinct-bigram table (x39 shard
    rank, no global sort); both LM artifacts are capped → broadcast;
    scoring is one corpus scan + two broadcast joins + one doc_id
    exchange."""
    docs = load_table(spark, "documents", sf_dir)
    counts = token_counts(docs)  # shared pass-1: ONE corpus token scan
    # r12 REVERT of the r11 shared-gram localCheckpoint: the
    # adjudicating interleaved A/B (VERDICT r11 #3; SCALE.md "Round 12:
    # x64/x45 adjudication") measured the twin tokenize passes FASTER
    # at sf0.1 (1.859 vs 2.002 s best-of-6, winning 5/6 reps) — the
    # eager checkpoint job + RDD re-entries cost more than the
    # tokenize pass it saves, and at scale the materialized gram
    # stream is ~corpus-sized (every adjacent pair re-concatenated),
    # so the checkpoint trades one scan+tokenize for writing AND
    # re-reading corpus-scale executor storage — not the bounded-small
    # artifact the BM25 tf checkpoint materializes (guide §5: cache
    # only when recompute costs more than the storage pressure).  The
    # ``grams=`` plumbing stays: training and scoring still accept a
    # shared stream for callers whose gram pass is genuinely expensive.
    big = train_bigram_lm(docs, counts=counts)
    vocab, stats = train_lm(docs, counts=counts)
    return score_bigram_lm(docs, big, vocab, stats)


def score_bigram_lm(
    docs: DataFrame,
    big: DataFrame,
    vocab: DataFrame,
    stats: DataFrame,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Scoring half of x45 (see x45_bigram_lm): docs against frozen
    bigram + unigram artifacts.  ``grams`` shares a precomputed
    (doc_id, g) stream with training (see x45_bigram_lm)."""
    if grams is None:
        grams = _doc_bigrams(docs)
    has_g = F.col("g").isNotNull()
    w2 = F.substring_index(F.col("g"), " ", -1)
    scored = (
        grams.join(F.broadcast(big), "g", "left")
        .join(
            F.broadcast(vocab.withColumnRenamed("cnt", "__w2cnt")),
            w2 == F.col("token"),
            "left",
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            has_g.alias("__has"),
            F.when(
                has_g,
                F.when(F.col("s_big").isNull(), 1.0).otherwise(0.0),
            ).alias("__backoff"),
            F.when(
                has_g,
                -F.log2(
                    F.coalesce(
                        F.col("s_big"),
                        F.lit(BACKOFF_ALPHA)
                        * F.coalesce(
                            F.col("__w2cnt").cast("double"), F.col("__unk")
                        )
                        / F.col("__total"),
                    )
                ),
            ).alias("__bits"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.when(F.col("__has"), 1).otherwise(0)).alias("__n"),
        F.avg("__backoff").alias("__backoff_frac"),
        F.avg("__bits").alias("__bits_avg"),
    )
    return agg.select(
        "doc_id",
        F.col("__n").cast("bigint").alias("n_transitions"),
        round_fixed(F.col("__backoff_frac"), 6).alias("backoff_frac"),
        round_fixed(F.col("__bits_avg"), 6).alias("bits_per_transition"),
    )


def _x45_sql() -> str:
    from ..functions.text import CASEFOLD_SQL

    tk = _TOKS_SQL.format(c=CASEFOLD_SQL.format(c="coalesce(text, '')"))
    return f"""
WITH toks AS (SELECT doc_id, {tk} AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS token FROM toks),
uni AS (SELECT token, COUNT(*) AS ucnt FROM tok GROUP BY token),
t AS (SELECT CAST(SUM(ucnt) AS DOUBLE) AS total FROM uni),
v AS (SELECT token, ucnt FROM (
        SELECT token, ucnt,
               ROW_NUMBER() OVER (ORDER BY ucnt DESC, token ASC) AS r
        FROM uni) WHERE r <= {LM_VOCAB}),
u AS (SELECT t.total,
             GREATEST(t.total - COALESCE(
                 (SELECT CAST(SUM(ucnt) AS DOUBLE) FROM v), 0.0),
                 1.0) AS unk
      FROM t),
gr AS (SELECT doc_id, unnest({_ngrams_sql(2)}) AS g FROM toks),
bc AS (SELECT g, COUNT(*) AS cnt FROM gr GROUP BY g),
big AS (SELECT b.g,
               CAST(b.cnt AS DOUBLE) / uni.ucnt AS s_big
        FROM (SELECT g, cnt FROM (
                SELECT g, cnt,
                       ROW_NUMBER() OVER (ORDER BY cnt DESC, g ASC) AS r
                FROM bc) WHERE r <= {BIGRAM_TOP_B}) b
        JOIN uni ON uni.token = split_part(b.g, ' ', 1)),
s AS (SELECT gr.doc_id,
             COUNT(*) AS n,
             AVG(CASE WHEN big.s_big IS NULL THEN 1.0 ELSE 0.0 END)
                 AS backoff_frac,
             AVG(-log2(COALESCE(big.s_big,
                 {BACKOFF_ALPHA} * COALESCE(CAST(v.ucnt AS DOUBLE), u.unk)
                     / u.total))) AS bits_avg
      FROM gr
      LEFT JOIN big USING (g)
      LEFT JOIN v ON v.token = split_part(gr.g, ' ', 2), u
      GROUP BY gr.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_transitions,
       {round_fixed_sql("s.backoff_frac", 6)} AS backoff_frac,
       {round_fixed_sql("s.bits_avg", 6)} AS bits_per_transition
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


_X45_SQL = _x45_sql()


def st07_streaming_lm_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of x42: the unigram LM is trained batch-side and
    PERSISTED to parquet (the frozen model artifact), the documents
    arrive as a file-source stream (several files → several
    micro-batches), and each micro-batch is scored against the frozen
    LM in foreachBatch.  The appended verdicts must equal the one-shot
    batch scoring, so the oracle is x42's SQL."""
    import os as _os
    import shutil
    import tempfile

    from ..streaming.pipeline import streaming_lm_gate

    docs = load_table(spark, "documents", sf_dir)
    root = tempfile.mkdtemp(prefix="st07_")
    vocab_path = _os.path.join(root, "lm_vocab")
    stats_path = _os.path.join(root, "lm_stats")
    batch_dir = _os.path.join(root, "batch")
    out_path = _os.path.join(root, "verdicts")
    ckpt = _os.path.join(root, "ckpt")
    try:
        vocab, stats = train_lm(docs)
        # the three artifact writes are independent (vocab/stats read
        # the checkpointed token counts, the batch staging re-scans
        # docs) — overlap them (guide §2.6, the st11/st06 pattern)
        from concurrent.futures import ThreadPoolExecutor

        writes = [
            lambda: vocab.write.parquet(vocab_path),
            lambda: stats.write.parquet(stats_path),
            # several arriving files → several micro-batches
            lambda: docs.repartition(3).write.parquet(batch_dir),
        ]
        with ThreadPoolExecutor(max_workers=3) as pool:
            for fut in [pool.submit(w) for w in writes]:
                fut.result()
        streaming_lm_gate(
            spark, batch_dir, vocab_path, stats_path, out_path, ckpt
        )
        # pin results before the temp tree disappears
        out = read_parquet_noinfer(spark, out_path).localCheckpoint()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def _x42_sql() -> str:
    from ..functions.text import CASEFOLD_SQL

    tk = _TOKS_SQL.format(c=CASEFOLD_SQL.format(c="coalesce(text, '')"))
    bits6 = round_fixed_sql("s.bits_avg", 6)
    return f"""
WITH tok AS (SELECT doc_id, unnest({tk}) AS token FROM documents),
c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
t AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
v AS (SELECT token, cnt FROM (
        SELECT token, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS r
        FROM c) WHERE r <= {LM_VOCAB}),
u AS (SELECT t.total,
             GREATEST(t.total - COALESCE(
                 (SELECT CAST(SUM(cnt) AS DOUBLE) FROM v), 0.0),
                 1.0) AS unk
      FROM t),
s AS (SELECT tok.doc_id,
             COUNT(*) AS n,
             AVG(CASE WHEN v.token IS NULL THEN 1.0 ELSE 0.0 END) AS oov_frac,
             AVG(-log2(COALESCE(CAST(v.cnt AS DOUBLE), u.unk) / u.total)) AS bits_avg
      FROM tok LEFT JOIN v USING (token), u
      GROUP BY tok.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(s.n, 0) AS BIGINT) AS n_tokens,
       {round_fixed_sql("s.oov_frac", 6)} AS oov_frac,
       {bits6} AS bits_per_token,
       COALESCE({bits6} BETWEEN {LM_KEEP_LO} AND {LM_KEEP_HI}, FALSE)
           AS keep_lm
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""


_X42_SQL = _x42_sql()


def x43_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-hygiene funnel: the gates chained in pipeline order —
    repetition (x29) → passage dedup (x40) → LM perplexity band
    (x42) — with per-stage attrition, the summary table an operator of
    a corpus cleaning run actually reads (every published pipeline —
    Gopher, RefinedWeb, Dolma — reports exactly this table).

    One row per stage: rows entering, rows surviving, and the drop
    fraction.  Stage k's rows_in equals stage k-1's rows_out by
    construction (the flags conjoin cumulatively), so the output is
    self-consistent and each gate's marginal cost is attributable.

    Shape at 100 TB: each gate keeps its own single-sourced kernel and
    plan (scan-local / two exchanges / broadcast-LM respectively); the
    funnel joins the three per-doc flag columns on doc_id — co-keyed,
    doc-sized exchanges — and collapses to a SCALAR aggregate before
    the 3-row stack, so nothing stage-shaped ever moves.  Fusing the
    three gates into one scan would save the flag joins but
    triple-maintain the kernels; the join formulation is the
    deliberate trade."""
    rep = x29_repetition_filters(spark, sf_dir).select(
        "doc_id", "keep_repetition"
    )
    pas = x40_passage_dedup(spark, sf_dir).select("doc_id", "keep_passage")
    lm = x42_lm_quality(spark, sf_dir).select("doc_id", "keep_lm")
    k1 = F.col("keep_repetition")
    k2 = k1 & F.col("keep_passage")
    k3 = k2 & F.col("keep_lm")
    totals = (
        rep.join(pas, "doc_id")
        .join(lm, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n0"),
            # coalesce: sum() over ZERO rows is NULL, but the funnel's
            # contract (and its oracle) reports 0-row stages, not NULLs
            F.coalesce(F.sum(k1.cast("long")), F.lit(0)).alias("n1"),
            F.coalesce(F.sum(k2.cast("long")), F.lit(0)).alias("n2"),
            F.coalesce(F.sum(k3.cast("long")), F.lit(0)).alias("n3"),
        )
    )
    stages = totals.select(
        F.expr(
            "stack(3,"
            " 1, 'repetition',    n0, n1,"
            " 2, 'passage_dedup', n1, n2,"
            " 3, 'lm_quality',    n2, n3"
            ") AS (stage_idx, stage, rows_in, rows_out)"
        )
    )
    drop = F.when(F.col("rows_in") == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.col("rows_out").cast("double") / F.col("rows_in")
    )
    return stages.select(
        F.col("stage_idx").cast("int").alias("stage_idx"),
        "stage",
        F.col("rows_in").cast("bigint").alias("rows_in"),
        F.col("rows_out").cast("bigint").alias("rows_out"),
        round_fixed(drop, 6).alias("drop_frac"),
    )


def _x43_sql() -> str:
    def stage(idx: int, name: str, i: str, o: str) -> str:
        frac = round_fixed_sql(
            f"CASE WHEN {i} = 0 THEN 0.0"
            f" ELSE 1.0 - CAST({o} AS DOUBLE) / {i} END",
            6,
        )
        return (
            f"SELECT CAST({idx} AS INTEGER) AS stage_idx,"
            f" '{name}' AS stage,"
            f" CAST({i} AS BIGINT) AS rows_in,"
            f" CAST({o} AS BIGINT) AS rows_out,"
            f" {frac} AS drop_frac FROM a"
        )

    return f"""
WITH rep AS (SELECT doc_id, keep_repetition FROM ({_X29_SQL}) r),
pas AS (SELECT doc_id, keep_passage FROM ({_X40_SQL}) p),
lm AS (SELECT doc_id, keep_lm FROM ({_X42_SQL}) l),
f AS (SELECT rep.doc_id,
             keep_repetition AS k1,
             keep_repetition AND keep_passage AS k2,
             keep_repetition AND keep_passage AND keep_lm AS k3
      FROM rep JOIN pas USING (doc_id) JOIN lm USING (doc_id)),
a AS (SELECT COUNT(*) AS n0,
             COALESCE(SUM(CASE WHEN k1 THEN 1 ELSE 0 END), 0) AS n1,
             COALESCE(SUM(CASE WHEN k2 THEN 1 ELSE 0 END), 0) AS n2,
             COALESCE(SUM(CASE WHEN k3 THEN 1 ELSE 0 END), 0) AS n3
      FROM f)
{stage(1, 'repetition', 'n0', 'n1')}
UNION ALL {stage(2, 'passage_dedup', 'n1', 'n2')}
UNION ALL {stage(3, 'lm_quality', 'n2', 'n3')}
"""


_X43_SQL = _x43_sql()


# --- x48: unicode script mix ------------------------------------------------
# Explicit codepoint ranges, not \p{Script=...} classes: Java regex and
# RE2 agree exactly on literal ranges, while named script classes have
# version-skew (assigned-codepoint differences across ICU/Unicode
# versions) — the same single-sourcing discipline as casefold().
_SCRIPT_RANGES = [
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("greek", "[\\x{0370}-\\x{03FF}]"),
    ("arabic", "[\\x{0600}-\\x{06FF}]"),
    ("cjk", "[\\x{4E00}-\\x{9FFF}]"),
]


def x48_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unicode-script histogram + dominant script + mixed
    flag — the script-level complement of lang_id (a doc claiming
    lang='en' that is 40% Cyrillic is mojibake, spam, or a labeling
    bug; CCNet-style corpora gate on exactly this).

    One codegen projection over the scan — five regexp_count columns,
    zero shuffles, zero Python.  Dominant = first script in the fixed
    order achieving the max count ('none' when no script binds);
    is_mixed = at least two scripts present."""
    docs = load_table(spark, "documents", sf_dir)
    text = F.coalesce(F.col("text"), F.lit(""))
    cnts = [
        (nm, F.regexp_count(text, F.lit(pat)).cast("int"))
        for nm, pat in _SCRIPT_RANGES
    ]
    best = F.lit("none")
    best_c = F.lit(0)
    for nm, c in cnts:  # strict > : first-listed script wins ties
        better = c > best_c
        best = F.when(better, F.lit(nm)).otherwise(best)
        best_c = F.when(better, c).otherwise(best_c)
    n_scripts = sum(
        (F.when(c > 0, 1).otherwise(0) for _, c in cnts), F.lit(0)
    ).cast("int")
    return docs.select(
        "doc_id",
        *[c.alias(f"n_{nm}") for nm, c in cnts],
        n_scripts.alias("n_scripts"),
        best.alias("dominant_script"),
        (n_scripts >= 2).alias("is_mixed"),
    )


def _x48_sql() -> str:
    cnt = {
        nm: f"CAST(len(regexp_extract_all(coalesce(text, ''), '{pat}')) AS INTEGER)"
        for nm, pat in _SCRIPT_RANGES
    }
    names = [nm for nm, _ in _SCRIPT_RANGES]
    mx = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    # first-in-order-wins argmax ≡ the Spark strict-> fold
    dom = "CASE WHEN " + mx + " = 0 THEN 'none' " + " ".join(
        f"WHEN n_{n} = {mx} THEN '{n}'" for n in names
    ) + " END"
    nsc = "CAST(" + " + ".join(
        f"(CASE WHEN n_{n} > 0 THEN 1 ELSE 0 END)" for n in names
    ) + " AS INTEGER)"
    return f"""
WITH c AS (
    SELECT doc_id, {', '.join(f"{e} AS n_{n}" for n, e in cnt.items())}
    FROM documents)
SELECT doc_id, {', '.join(f"n_{n}" for n in names)},
       {nsc} AS n_scripts,
       {dom} AS dominant_script,
       {nsc} >= 2 AS is_mixed
FROM c
"""


# --- x49: Zipf rank-frequency fit -------------------------------------------
ZIPF_TOP_R = 200


def x49_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus health diagnostic: OLS slope of log(freq) vs log(rank)
    over the top-R token frequencies (natural text tracks Zipf's law,
    slope ≈ -1; template/boilerplate-heavy or synthetic corpora bend
    it).  Brants et al. 2007-style corpus statistics, single-number.

    Scale shape: the corpus collapses to the distinct-token table
    (shared checkpointed token_counts pass), the top-R cut is
    orderBy+limit → TakeOrderedAndProject (per-partition top-R, no
    global sort), and the unpartitioned rank window touches exactly R
    rows — a CONSTANT, not a function of corpus size."""
    docs = load_table(spark, "documents", sf_dir)
    counts = token_counts(docs)
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(ZIPF_TOP_R)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    agg = ranked.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    guard = F.col("n") < 2  # degenerate: no spread in ln(rank)
    return agg.select(
        F.col("n").cast("bigint").alias("n_top_tokens"),
        round_fixed(F.when(guard, F.lit(0.0)).otherwise(slope), 6).alias(
            "zipf_slope"
        ),
        round_fixed(
            F.when(guard, F.lit(0.0)).otherwise(intercept), 6
        ).alias("zipf_intercept"),
    )


def _x49_sql() -> str:
    from ..functions.text import CASEFOLD_SQL

    tk = _TOKS_SQL.format(c=CASEFOLD_SQL.format(c="coalesce(text, '')"))
    return f"""
WITH tok AS (SELECT doc_id, unnest({tk}) AS token FROM documents),
c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
top AS (SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) AS r
        FROM c QUALIFY r <= {ZIPF_TOP_R}),
pts AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
        FROM top),
s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM pts)
SELECT CAST(n AS BIGINT) AS n_top_tokens,
       {round_fixed_sql(
           "CASE WHEN n < 2 THEN 0.0 ELSE"
           " (n * sxy - sx * sy) / (n * sxx - sx * sx) END", 6)}
           AS zipf_slope,
       {round_fixed_sql(
           "CASE WHEN n < 2 THEN 0.0 ELSE"
           " (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n END",
           6)} AS zipf_intercept
FROM s
"""


QUALITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "x29_repetition_filters": x29_repetition_filters,
    "x30_pii_scan": x30_pii_scan,
    "x31_contamination": x31_contamination,
    "x40_passage_dedup": x40_passage_dedup,
    "x68_duplicate_spans": x68_duplicate_spans,
    "x69_span_cut_text": x69_span_cut_text,
    "x42_lm_quality": x42_lm_quality,
    "st07_streaming_lm_gate": st07_streaming_lm_gate,
    "x45_bigram_lm": x45_bigram_lm,
    "x43_corpus_funnel": x43_corpus_funnel,
    "x48_script_mix": x48_script_mix,
    "x49_zipf_fit": x49_zipf_fit,
}
QUALITY_ORACLE: dict[str, str] = {
    "x29_repetition_filters": _X29_SQL,
    "x30_pii_scan": _X30_SQL,
    "x31_contamination": _X31_SQL,
    "x40_passage_dedup": _X40_SQL,
    "x68_duplicate_spans": _X68_SQL,
    "x69_span_cut_text": _X69_SQL,
    "x42_lm_quality": _X42_SQL,
    "st07_streaming_lm_gate": _X42_SQL,
    "x45_bigram_lm": _X45_SQL,
    "x43_corpus_funnel": _X43_SQL,
    "x48_script_mix": _x48_sql(),
    "x49_zipf_fit": _x49_sql(),
}
