"""Empirical scaling probe: time headline operators at 1x (sf0.1) and
Nx (default 10x) the fixture volume and report the runtime ratio per
operator, so "would this plan survive a scale-up?" is measured, not
asserted.  Results are committed as SCALE.md.

The Nx corpus is derived from the sf0.1 fixtures (never synthesized
from scratch — TESTDATA.md is the source of truth for shape):

- ``documents``: N perturbed replicas; each replica appends a replica
  marker token to the text and offsets doc_id.  Replicas of a doc are
  mutual near-duplicates (a long shared prefix), which is exactly what
  a real crawl's duplication looks like — so dedup/LSH operators see a
  REALISTIC harder workload (pair fan-out grows with duplication),
  not an artificial exact-copy explosion.
- ``embeddings``: N replicas with a small deterministic per-replica
  rotation-free perturbation (component nudge), vec_id offset.
- ``events``: N replicas shifted by k days, event_id offset — window,
  session, as-of and skew operators scale linearly in input.
- ``lineitem``/``orders``: N replicas with key offsets — relational
  scan/agg/join queries at N× rows (dims stay fixed, as they would at
  100 TB: fact grows, dimensions don't).

Usage::

    python tools/scale_probe.py [N] [out_dir] [--fixed-dup] [--docs-only]
                                [--emb-only] [--runs=K] [probe ...]
    # default N=10, out_dir=/tmp/spark_graft_scale_sf1, all PROBES
    # out_dir must contain a "/" (else it is read as the first probe)
    # --fixed-dup: constant-duplication-rate corpus variant (see
    #   build_scaled) — the curve a crawl growing by NEW content sees
    # --docs-only / --emb-only: replicate ONLY documents / embeddings
    #   (crossJoin builders — the thousand-x decades for the text and
    #   vector flagships; other tables copy at 1x)
    # --runs=K: best-of-K timing (default 3; the 1000x decades use 2 —
    #   at 100s+ per query the relative GC/JIT noise best-of-3 exists
    #   to absorb is already small)

Interpretation notes printed with the table: operators whose OUTPUT is
pair-shaped (x03/x14 LSH near-dup) are expected to grow faster than
input scale when duplication grows — their cost is output-bound, which
is the correct behaviour (candidate generation stays bucket-local).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"


def build_docs_scaled(spark, n: int, out_dir: str) -> None:
    """Documents-only N× corpus for the THOUSAND-x decade of the text
    flagships: documents replicate via ONE crossJoin against
    ``spark.range(n)`` (a 1000-way unionByName plan chokes the
    analyzer; the crossJoin is a single 2-node plan), every other table
    copies at 1× (the text operators never read them).  Replica
    semantics match build_scaled's default: replica k appends a
    `` repl{k}`` marker, so replicas of a doc are mutual near-dups."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f"_built_docs_x{n}")
    if os.path.exists(done_marker):
        return
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n_docs = docs.count()
    others = [c for c in docs.columns if c not in ("doc_id", "text")]
    reps = spark.range(n).withColumnRenamed("id", "__k")
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("__k") * n_docs).alias("doc_id"),
            F.when(F.col("__k") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" repl"), F.col("__k")))
            .alias("text"),
            *others,
        )
        # 32 output files: the crossJoin inherits the 1-partition fixture
        # scan, and ONE parquet file with ONE row group cannot be split -
        # every downstream scan would run on a single task (this exact
        # artifact silently single-threaded the r7 1000x decade; the
        # probes measured one core, not the plan)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "documents.parquet"))
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))
    with open(done_marker, "w") as fh:
        fh.write("ok")


def build_emb_scaled(spark, n: int, out_dir: str) -> None:
    """Embeddings-only N× corpus for the thousand-x decade of the
    VECTOR flagships (x59/x60/x62): embeddings replicate via ONE
    crossJoin (same analyzer rationale as build_docs_scaled) with a
    deterministic per-replica component nudge (replica k adds
    k·1e-4 to component (k mod dim) — cheap, order-free, keeps vectors
    distinct so top-k ties don't explode); every other table copies at
    1× (the vector operators never read them)."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f"_built_emb_x{n}")
    if os.path.exists(done_marker):
        return
    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    n_vec = emb.count()
    others = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    reps = spark.range(n).withColumnRenamed("id", "__k")
    dim = F.size(F.col("embedding"))
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("__k") * n_vec).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), dim - 1),
                lambda v, i: F.when(
                    i == F.pmod(F.col("__k"), dim), v + F.col("__k") * 1e-4
                ).otherwise(v),
            ).alias("embedding"),
            *others,
        )
        # 32 files - single-row-group corpora single-thread every scan
        # (see build_docs_scaled)
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "embeddings.parquet"))
    )
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))
    with open(done_marker, "w") as fh:
        fh.write("ok")


def build_scaled(spark, n: int, out_dir: str, fixed_dup: bool = False) -> None:
    """``fixed_dup=True`` builds the constant-duplication-rate variant:
    replicas are made mutually DISSIMILAR (per-replica token suffix on
    every word — within-replica word-shingle Jaccard is preserved
    exactly, cross-replica overlap drops to zero; per-replica circular
    component shift on embeddings — a permutation, so within-replica
    inner products are preserved exactly while cross-replica cosines
    decorrelate).  The default replica corpus grows duplication with N
    (realistic for a crawl that re-fetches); the fixed-dup corpus is
    what a crawl growing by NEW content looks like — the pair-shaped
    operators' cost should then track the data ratio, not the pair
    blow-up."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    done_marker = os.path.join(out_dir, f"_built_x{n}")
    if os.path.exists(done_marker):
        return

    def replicas(df, id_cols: dict[str, int], extra=None):
        """Union n copies of df with per-replica id offsets; ``extra``
        maps column -> fn(col, replica_index_col) for perturbations."""
        out = None
        for k in range(n):
            d = df
            for c, stride in id_cols.items():
                d = d.withColumn(c, (F.col(c) + F.lit(k * stride)).cast("long"))
            if extra:
                for c, fn in extra.items():
                    d = d.withColumn(c, fn(F.col(c), k))
            out = d if out is None else out.unionByName(d)
        return out

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    n_docs = docs.count()
    if fixed_dup:
        # suffix every token with the replica index: replica k of a doc
        # shares NO word shingles with replica j≠k, while two docs that
        # were near-dups in the base stay near-dups within every replica
        docs_text = lambda c, k: (  # noqa: E731
            F.regexp_replace(c, r"(\S+)", f"$1~{k}") if k else c
        )
    else:
        docs_text = lambda c, k: (  # noqa: E731
            F.concat(c, F.lit(f" repl{k}")) if k else c
        )
    replicas(
        docs,
        {"doc_id": n_docs},
        extra={"text": docs_text},
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    n_emb = emb.count()
    if fixed_dup:
        # per-replica SIGN FLIP pattern: a diagonal orthogonal transform,
        # so norms and within-replica inner products are bit-identical,
        # while across replicas ~half the component products flip sign
        # and cosines collapse toward 0.  (A circular shift was tried
        # first and failed: the fixture embeddings carry shift-invariant
        # structure, so shifted replicas stayed near-dups.)
        def emb_perturb(c, k):
            if not k:
                return c
            return F.zip_with(
                c,
                F.sequence(F.lit(1), F.size(c)),
                lambda x, i: F.when(
                    F.pmod(F.hash(F.lit(k), i), 2) == 0, x
                ).otherwise(-x),
            )
    else:
        emb_perturb = lambda c, k: F.transform(  # noqa: E731
            c, lambda x: x + F.lit(0.001 * k)
        )
    replicas(
        emb,
        {"vec_id": n_emb},
        extra={"embedding": emb_perturb},
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    # flavor-aware events read (the fixture has shipped both
    # TIMESTAMP(NANOS)-as-int64 and timestamp[us]); the repair gives a
    # true timestamp column so the INTERVAL shift below is well-typed
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        read_events_raw,
        repair_events_ts,
    )

    ev = repair_events_ts(
        read_events_raw(spark, os.path.join(SRC, "events.parquet"))
    )
    n_ev = ev.count()
    replicas(
        ev,
        {"event_id": n_ev, "user_id": 0},
        extra={
            "ts": lambda c, k: c + F.expr(f"INTERVAL {k} DAYS")
        },
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    replicas(li, {"l_orderkey": 6_000_000}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "lineitem.parquet")
    )
    od = spark.read.parquet(os.path.join(SRC, "orders.parquet"))
    replicas(od, {"o_orderkey": 6_000_000}).write.mode("overwrite").parquet(
        os.path.join(out_dir, "orders.parquet")
    )
    # dims + small tables: unchanged (facts grow, dimensions don't)
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(os.path.join(SRC, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))
    with open(done_marker, "w") as fh:
        fh.write("ok")


PROBES = [
    "q01_pricing_summary",
    "q06_latest_event_per_user",
    "q07_star_join_rollup",
    "x01_exact_dedup",
    "x03_minhash_lsh_pairs",
    "x05_simhash",
    "x63_fuzzy_join",
    "x08_text_stats",
    "x09_tumbling_window",
    "x11_sessionize",
    "x12_ivf_topk",
    "x14_embedding_lsh_near_dup",
    "x16_asof_join",
    "x19_tfidf_topk",
    "x58_bm25_topk",
    "x61_bm25_persisted_index",
    "x59_pq_encode",
    "x60_pq_adc_topk",
    "x62_ivf_pq_topk",
    "x65_ivf_pq_persisted_index",
    "x64_mmr_diversified_topk",
    "x66_ann_mmr_rerank",
    "x26_pack_sequences",
    "x28_stable_row_ids",
    "x33_token_budget_select",
    "x34_epoch_shuffle",
    "x38_chunk_documents",
    "x39_vocab_coverage",
    "x40_passage_dedup",
    "x68_duplicate_spans",
    "x69_span_cut_text",
    "x41_semantic_dedup",
    "x42_lm_quality",
    "x44_snapshot_diff",
    "x45_bigram_lm",
    "x46_source_quota",
    "x48_script_mix",
    "x49_zipf_fit",
    "x50_source_similarity",
    "x52_source_calibration",
    "x53_cms_heavy_hitters",
    "x54_zorder_layout",
    "x55_kmv_source_overlap",
    "x56_native_session_window",
    "x57_mergeable_rollup",
    # r11: the CC family — the driver union-find fast path (Finding 5)
    # gates on MEASURED edge count, so the 10× replica corpus (edges
    # grow ~quadratically in duplication) must be measured under it
    "x20_dedup_clusters",
    "x32_canonical_docs",
    "x35_incremental_dedup",
]

# operators whose result is pair/fan-out shaped: their cost tracks
# OUTPUT size, which grows faster than input when duplication grows —
# report output rows alongside time so the ratio is interpretable
OUTPUT_BOUND = {
    "x03_minhash_lsh_pairs",
    "x14_embedding_lsh_near_dup",
    # replica corpora make every replica set mutual near-keys, so the
    # pair-shaped result grows ~quadratically in duplication — cost is
    # output-bound by design
    "x63_fuzzy_join",
}


def main() -> int:
    runs = 3
    argv = []
    for a in sys.argv[1:]:
        if a in ("--fixed-dup", "--docs-only", "--emb-only"):
            continue
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
            continue
        argv.append(a)
    fixed_dup = "--fixed-dup" in sys.argv
    docs_only = "--docs-only" in sys.argv
    emb_only = "--emb-only" in sys.argv
    n = int(argv[0]) if argv else 10
    # out_dir must look like a path — otherwise it's the first probe name
    if len(argv) > 1 and ("/" in argv[1] or argv[1].startswith(".")):
        out_dir, probe_args = argv[1], argv[2:]
    else:
        if fixed_dup:
            out_dir = f"/tmp/spark_graft_scale_fixdup{n}"
        elif docs_only:
            out_dir = f"/tmp/spark_graft_scale_docs{n}"
        elif emb_only:
            out_dir = f"/tmp/spark_graft_scale_emb{n}"
        else:
            out_dir = "/tmp/spark_graft_scale_sf1"
        probe_args = argv[1:]
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="scale-probe")
    if docs_only:
        build_docs_scaled(spark, n, out_dir)
    elif emb_only:
        build_emb_scaled(spark, n, out_dir)
    else:
        build_scaled(spark, n, out_dir, fixed_dup=fixed_dup)

    # warm engine paths once (same rationale as bench.py)
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()

    wanted = probe_args or PROBES
    results = {}
    for name in wanted:
        fn = suites.FULL_QUERIES[name]
        row = {}
        for label, sf_dir in (("base", SRC), (f"x{n}", out_dir)):
            best = None
            for _ in range(runs):
                # untimed GC barrier (as bench.py): collect the previous
                # run's garbage now so its pause doesn't bill this timing
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # noop sink (as bench.py): count() would let Catalyst
                # prune every computed column and time only the scan
                df.write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rows = fn(spark, sf_dir).count()  # untimed, for the report
            row[label] = {"sec": round(best, 3), "rows": rows}
        row["ratio"] = round(row[f"x{n}"]["sec"] / max(row["base"]["sec"], 1e-9), 2)
        results[name] = row
        print(
            f"{name:32s} base={row['base']['sec']:7.3f}s "
            f"x{n}={row[f'x{n}']['sec']:7.3f}s ratio={row['ratio']:6.2f} "
            f"rows {row['base']['rows']} -> {row[f'x{n}']['rows']}"
            + ("  [output-bound]" if name in OUTPUT_BOUND else ""),
            flush=True,
        )
    print(json.dumps({"n": n, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
