"""Registry suites: merged driver-contract entries.

The external driver scores at most 50 registry rows per round, and the
fine-grained registry grew to 70 — so 20 queries/round went unscored
(round-3 verdict, "What's missing" #1).  This module folds the
fine-grained queries into themed *suites* so every operator gets driver
evidence every round, without touching the fine-grained functions
themselves (bench.py, tests, and tools/local_sweep.py still exercise
each one individually — see FULL_QUERIES).

Mechanics: each suite tags every sub-query's rows with a ``sub`` column
and unions them with NULL-padding (Spark ``unionByName(
allowMissingColumns=True)`` ↔ DuckDB ``UNION ALL BY NAME``), preserving
every sub-result's typed columns.  Sub-queries within a suite are chosen
so any shared column name carries the same type on both engines.  The
driver's order-insensitive hash then verifies every sub-query's values
exactly as it did when they were separate rows in the registry.

q13_prefix_match is the one fine-grained query dropped from the scored
registry without a suite: its operators (J4 longest-prefix join / D8
classifier) already have hash-green driver evidence through
c04_chess_openings_classified every round; it stays in FULL_QUERIES and
the committed sweep.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import driver as _driver
from . import extensions as _ext
from . import pipelines as _pipe
from . import quality as _quality
from . import selection as _selection

QueryFn = Callable[[SparkSession, str], DataFrame]


def _suite(parts: dict[str, QueryFn]) -> QueryFn:
    """Tagged NULL-padding union of sub-query results (see module doc)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        out: DataFrame | None = None
        for tag, fn in parts.items():
            d = fn(spark, sf_dir).select(F.lit(tag).alias("sub"), "*")
            out = d if out is None else out.unionByName(
                d, allowMissingColumns=True
            )
        assert out is not None
        return out

    return run


def _suite_sql(parts: dict[str, str]) -> str:
    return "\nUNION ALL BY NAME\n".join(
        f"SELECT '{tag}' AS sub, * FROM ({sql.strip().rstrip(';')})"
        for tag, sql in parts.items()
    )


# suite name → ordered sub-queries (names refer to the fine-grained
# registries in plans.driver / plans.extensions / plans.pipelines)
_SUITE_PARTS: dict[str, list[str]] = {
    # P1/P2 wide projection + P3 CASE + P7 BETWEEN/quarter + F6-F12 scalars
    "q02_scalar_projection_suite": [
        "q02_computed_projection",
        "q03_case_date_buckets",
        "q12_scalar_suite",
    ],
    # P4 LIKE pushdown + P5/J3 anti join + semi join
    "q04_filter_semi_anti": [
        "q04_like_filters",
        "q05_anti_join",
        "q20_semi_join",
    ],
    # W1 latest-wins dedup + JSON extraction + ordered string agg
    "q06_event_enrichment": [
        "q06_latest_event_per_user",
        "q23_json_extract",
        "q24_string_agg",
    ],
    # O1-O3 global top-k + decorrelated scalar subqueries
    "q08_order_ranking": [
        "q08_top_orders",
        "q28_correlated_subquery",
    ],
    # U1 UNION distinct + U2 UNION ALL + INTERSECT/EXCEPT
    "q09_set_ops_suite": [
        "q09_set_ops",
        "q10_union_all_counts",
        "q17_intersect_except",
    ],
    # A1/A3/A4 distinct+watermark + exact median + integer-moment stats
    "q11_aggregate_suite": [
        "q11_distinct_watermark",
        "q19_exact_median",
        "q26_stats_moments",
    ],
    # ROLLUP + CUBE + GROUPING SETS: one Expand-lattice family
    "q14_grouping_lattice": [
        "q14_rollup",
        "q22_cube",
        "q29_grouping_sets",
    ],
    # analytic windows: group top-k, lag/lead/running, SCD2, funnel
    "q15_window_suite": [
        "q15_group_topk",
        "q21_window_suite",
        "q25_scd2",
        "q27_funnel",
    ],
    # long→wide and wide→long reshape pair
    "q16_reshape_suite": [
        "q16_pivot",
        "q18_unpivot",
    ],
    # text stats + the corpus-hygiene gates (repetition filters, PII
    # scan/redaction, benchmark contamination, cross-doc passage dedup,
    # unigram-LM perplexity band) + context-window chunking +
    # vocabulary/OOV coverage — one text-processing family
    "x08_text_quality_suite": [
        "x08_text_stats",
        "x29_repetition_filters",
        "x30_pii_scan",
        "x31_contamination",
        "x40_passage_dedup",
        "x68_duplicate_spans",
        "x69_span_cut_text",
        "x42_lm_quality",
        "st07_streaming_lm_gate",
        "x45_bigram_lm",
        "x43_corpus_funnel",
        "x38_chunk_documents",
        "x39_vocab_coverage",
        "x48_script_mix",
        "x49_zipf_fit",
    ],
    # tumbling + sliding time windows + native session windows (x11's
    # gaps-and-islands session form stays separate as st02's batch
    # oracle twin; x56 is the same concept through Catalyst's native
    # session-window operator)
    "x09_time_windows": [
        "x09_tumbling_window",
        "x10_sliding_window",
        "x56_native_session_window",
        "st10_streaming_native_sessions",
    ],
    # text-similarity verify/matching family: exact n-gram Jaccard over
    # a candidate set, SimHash signatures, and the PassJoin fuzzy
    # (edit-distance) key join — three text-pair similarity kernels
    "x04_textsim_suite": [
        "x04_ngram_jaccard",
        "x05_simhash",
        "x63_fuzzy_join",
    ],
    # skew mitigation: two-phase hot-key count + salted join (one family)
    "x15_skew_suite": [
        "x15_skew_salted_count",
        "x24_salted_join",
    ],
    # lexical retrieval: per-document salient terms (tf-idf) + per-query
    # document ranking (BM25) — the two sides of the same inverted-index
    # (doc, term, tf) table (one family)
    "x19_retrieval_suite": [
        "x19_tfidf_topk",
        "x58_bm25_topk",
        "x61_bm25_persisted_index",
        "st11_streaming_bm25",
    ],
    # as-of + range join: the two temporal-join kernels (one family)
    "x16_temporal_joins": [
        "x16_asof_join",
        "x17_range_join",
    ],
    # corpus selection & maintenance: canonical-doc-per-cluster,
    # token-budget greedy selection, deterministic epoch shuffle,
    # batch-vs-index incremental dedup, IVF-cell semantic dedup
    # (one family)
    "x32_corpus_selection": [
        "x32_canonical_docs",
        "x33_token_budget_select",
        "x34_epoch_shuffle",
        "x35_incremental_dedup",
        "x36_mixture_sample",
        "st06_streaming_incremental_dedup",
        "x37_leakage_safe_split",
        "x41_semantic_dedup",
        "x44_snapshot_diff",
        "x46_source_quota",
        "x47_weighted_sample",
        "x50_source_similarity",
        "x52_source_calibration",
    ],
    # embedding vector transforms: int8 quantization + signed random
    # projection (one family; both zero-shuffle scan-local projections)
    "x27_vector_suite": [
        "x27_quantize_embeddings",
        "x51_random_projection",
        "x59_pq_encode",
        "x60_pq_adc_topk",
        "x62_ivf_pq_topk",
        "st12_streaming_ivf_pq",
        "x64_mmr_diversified_topk",
        "x65_ivf_pq_persisted_index",
        "x66_ann_mmr_rerank",
        "x67_persisted_ann_mmr",
    ],
    # mergeable-summary family: HLL/quantile bounded-error contracts,
    # count-min heavy hitters (exact-reproducible cells), the streaming
    # sketch merge proving CMS linearity (st09's oracle is x53's batch
    # SQL), KMV source overlap, and mergeable rollup state (x57's
    # oracle is the one-pass recompute — associativity, hash-checked)
    "x21_sketch_suite": [
        "x21_approx_sketches",
        "x53_cms_heavy_hitters",
        "st09_streaming_sketch_merge",
        "x55_kmv_source_overlap",
        "x57_mergeable_rollup",
    ],
    # table-ops family: column profiling (the stats pruning reads) +
    # z-order layout (the clustering that makes those stats selective
    # on every dimension)
    "x23_table_ops_suite": [
        "x23_profile",
        "x54_zorder_layout",
    ],
    # watermarked stream-stream interval joins: inner + left-outer
    # (outer exercises state EVICTION — a result that exists only
    # because no future match is possible)
    "st05_stream_join_suite": [
        "st05_stream_stream_join",
        "st08_stream_stream_left_join",
    ],
    # mapInPandas feature extraction + resize/frame-sample plumbing
    "m01_multimodal_suite": [
        "m01_multimodal_features",
        "m02_multimodal_resize",
    ],
}

_FINE_QUERIES: dict[str, QueryFn] = {
    **_pipe.PIPELINE_QUERIES,
    **_ext.EXT_QUERIES,
    **_quality.QUALITY_QUERIES,
    **_selection.SELECTION_QUERIES,
    **_driver.QUERIES,
}
_FINE_ORACLE: dict[str, str] = {
    **_pipe.PIPELINE_ORACLE,
    **_ext.EXT_ORACLE,
    **_quality.QUALITY_ORACLE,
    **_selection.SELECTION_ORACLE,
    **_driver.ORACLE,
}

SUITE_QUERIES: dict[str, QueryFn] = {
    name: _suite({sub: _FINE_QUERIES[sub] for sub in subs})
    for name, subs in _SUITE_PARTS.items()
}


def _corpus_selection_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x32_corpus_selection with the expensive shared kernel computed
    ONCE: x32 and x37 both need the near-dup cluster map (MinHash-LSH
    pairs + iterative connected components — the suite's dominant
    cost); precompute it, pin it with localCheckpoint, and pass it to
    both.  Sub-query outputs are identical to their standalone forms —
    the frame handed in is exactly what each would have built."""
    clusters = _selection._dup_clusters(spark, sf_dir).localCheckpoint()
    parts: dict[str, QueryFn] = {}
    for sub in _SUITE_PARTS["x32_corpus_selection"]:
        if sub in ("x32_canonical_docs", "x37_leakage_safe_split"):
            parts[sub] = (
                lambda spark, sf_dir, _fn=_FINE_QUERIES[sub]: _fn(
                    spark, sf_dir, clusters=clusters
                )
            )
        else:
            parts[sub] = _FINE_QUERIES[sub]
    return _suite(parts)(spark, sf_dir)


SUITE_QUERIES["x32_corpus_selection"] = _corpus_selection_suite
SUITE_ORACLE: dict[str, str] = {
    name: _suite_sql({sub: _FINE_ORACLE[sub] for sub in subs})
    for name, subs in _SUITE_PARTS.items()
}

_SUBSUMED: set[str] = {s for subs in _SUITE_PARTS.values() for s in subs} | {
    "q13_prefix_match"  # J4/D8 driver evidence via c04 (module docstring)
}

# The ≤50-entry scored registry: fine-grained entries that aren't folded
# into a suite, plus the suites (inserted where their first sub-query
# sat, so evidence ordering stays stable).
REGISTRY_QUERIES: dict[str, QueryFn] = {}
REGISTRY_ORACLE: dict[str, str] = {}
_placed: set[str] = set()
for _name in _FINE_QUERIES:
    if _name in _SUBSUMED:
        for _suite_name, _subs in _SUITE_PARTS.items():
            if _name in _subs and _suite_name not in _placed:
                _placed.add(_suite_name)
                REGISTRY_QUERIES[_suite_name] = SUITE_QUERIES[_suite_name]
                REGISTRY_ORACLE[_suite_name] = SUITE_ORACLE[_suite_name]
        continue
    REGISTRY_QUERIES[_name] = _FINE_QUERIES[_name]
    if _name in _FINE_ORACLE:
        REGISTRY_ORACLE[_name] = _FINE_ORACLE[_name]

# Everything — scored registry + the fine-grained queries the suites
# subsume — for tools/local_sweep.py's committed full sweep.
FULL_QUERIES: dict[str, QueryFn] = {**REGISTRY_QUERIES, **_FINE_QUERIES}
FULL_ORACLE: dict[str, str] = {**REGISTRY_ORACLE, **_FINE_ORACLE}
