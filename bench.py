#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the `noop` sink — full computation of every
output column, no driver-side collect overhead, no files written.

Measurement protocol (the SCALE.md solo-re-measure discipline, adopted
for the committed per-round artifact after r6's bench was taken on a
hot box and overstated a regression): run SOLO on an otherwise idle
machine — never concurrently with sweeps/probes/tests — after the
built-in warm-up pass below (one noop job to JIT/fill code caches).
Treat any single anomalous per-query ratio as unconfirmed until a solo
re-run reproduces it.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import get_spark  # noqa: E402
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (  # noqa: E402
    driver as _driver,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (  # noqa: E402
    extensions as _ext,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (  # noqa: E402
    quality as _quality,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import (  # noqa: E402
    selection as _selection,
)

# headline set: the scan/agg flagship, the heavy relational shapes, the
# prefix-match custom operator, and the extension operators that matter
# at corpus scale.
HEADLINE = [
    "q01_pricing_summary",
    "q02_computed_projection",
    "q06_latest_event_per_user",
    "q07_star_join_rollup",
    "q12_scalar_suite",
    "q13_prefix_match",
    "x01_exact_dedup",
    "x03_minhash_lsh_pairs",
    "x05_simhash",
    "x63_fuzzy_join",
    "x64_mmr_diversified_topk",
    "x07_similarity_topk",
    "x08_text_stats",
    "x09_tumbling_window",
    "x11_sessionize",
    "x12_ivf_topk",
    "x14_embedding_lsh_near_dup",
    "x16_asof_join",
    "x19_tfidf_topk",
    "x58_bm25_topk",
    "x61_bm25_persisted_index",
    # PQ/ANN family (r9 verdict #6): the headline keeps the shapes a
    # production cluster runs — x62 (the canonical in-plan IVF×PQ
    # composition), x65 (build-cadence: train+persist+score), and x67
    # (serving: persisted pool → exact rerank → MMR).  x59 (bare
    # encode), x60 (flat ADC) and x66 (re-encoding MMR twin of x67)
    # are subsumed stages of those three; they stay oracle-scored in
    # FULL_QUERIES and the committed sweeps.
    "x62_ivf_pq_topk",
    "x65_ivf_pq_persisted_index",
    "x67_persisted_ann_mmr",
    "x20_dedup_clusters",
    "x29_repetition_filters",
    "x31_contamination",
    "x40_passage_dedup",
    "x68_duplicate_spans",
    "x42_lm_quality",
    "x45_bigram_lm",
    "x32_canonical_docs",
    "x33_token_budget_select",
    "x35_incremental_dedup",
    "x41_semantic_dedup",
    "x44_snapshot_diff",
    "x38_chunk_documents",
    "x39_vocab_coverage",
    "x46_source_quota",
    "x50_source_similarity",
    "x53_cms_heavy_hitters",
    "x54_zorder_layout",
    "x55_kmv_source_overlap",
    "x56_native_session_window",
    "x57_mergeable_rollup",
    "q14_rollup",
    "q22_cube",
    "q25_scd2",
    "q27_funnel",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    registry = {
        **_driver.QUERIES,
        **_ext.EXT_QUERIES,
        **_quality.QUALITY_QUERIES,
        **_selection.SELECTION_QUERIES,
    }

    # warm the JVM / codegen / noop-sink / vectorized-parquet-reader /
    # broadcast and window exec paths, so the first timed queries measure
    # query cost rather than one-time engine initialization
    spark.range(1_000_000).selectExpr("sum(id) AS s").write.format("noop").mode(
        "overwrite"
    ).save()
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    small = spark.range(100).withColumnRenamed("id", "k")
    (
        spark.range(10_000)
        .withColumn("k", F.col("id") % 100)
        .join(F.broadcast(small), "k")
        .withColumn("rn", F.row_number().over(Window.partitionBy("k").orderBy("id")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # time the build call too: iterative operators (connected
        # components, k-means) do their work eagerly inside it, and a
        # post-build timer would only measure their cached final frame.
        # best-of-3 runs: the min is the query's cost with warm code
        # paths; the slower runs fold in GC pauses, JIT recompiles, and
        # machine contention noise that say nothing about the plan
        # (observed: a single best-of-2 pair once landed 3.7s for a
        # query whose warm cost is 0.5s — both runs hit the same pause).
        best = None
        for _ in range(3):
            # untimed GC barrier: collect the previous run's garbage
            # NOW so its pause doesn't land inside the next timing
            # (observed: a 1.6s query billed 5s when a neighbour's
            # garbage came due mid-run)
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df = registry[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # Machine-speed calibration stamp: a FIXED pure-compute Spark job
    # (no I/O, no fixture dependence), best-of-3 like the queries.  The
    # r6→r7 bench saga showed per-round totals drift ~10-20% with the
    # container's machine state even solo; dividing two rounds'
    # per-query times by their calib ratio separates code regressions
    # from machine drift.
    calib_best = None
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        (
            spark.range(30_000_000)
            .selectExpr(
                "sum(sin(CAST(id AS DOUBLE)) * cos(CAST(id % 97 AS DOUBLE))) AS s"
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        dt = time.perf_counter() - t0
        calib_best = dt if calib_best is None else min(calib_best, dt)

    # I/O-shaped calibration stamp (r9 verdict #1: the pure-compute
    # stamp does NOT capture the machine-state dimension that moves the
    # I/O-and-shuffle-heavy queries — r9's own back-to-back solo runs
    # drifted up to 25% on them while calib_sec held).  A FIXED
    # synthetic parquet table (4M rows, a high-entropy md5 column so
    # parquet can't dictionary it away) is written untimed to a temp
    # dir, then scan + hash-shuffle + agg is timed best-of-3.  Two
    # stamps bracket a regression call: a query ratio explained by
    # NEITHER stamp's drift is code, not machine.
    import shutil
    import tempfile

    io_dir = tempfile.mkdtemp(prefix="bench_io_calib_")
    calib_io_best = None
    try:
        (
            spark.range(4_000_000)
            .selectExpr(
                "id",
                "id % 1000 AS k",
                "CAST(id % 7 AS DOUBLE) AS v",
                "md5(CAST(id AS STRING)) AS pad",
            )
            .repartition(16)
            .write.mode("overwrite")
            .parquet(io_dir)
        )
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            (
                spark.read.parquet(io_dir)
                .groupBy("k")
                .agg(
                    F.sum("v").alias("sv"),
                    F.count("*").alias("c"),
                    F.min("pad").alias("mp"),
                )
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            dt = time.perf_counter() - t0
            calib_io_best = dt if calib_io_best is None else min(calib_io_best, dt)
    finally:
        shutil.rmtree(io_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calib_sec": round(calib_best, 3),
        "calib_io_sec": round(calib_io_best, 3),
    }
    # Normalize by the calibration stamp so cross-round comparisons
    # stop re-litigating machine drift by hand (r7 verdict #2: nothing
    # consumed calib_sec; the judge and builder each spent a session
    # adjudicating a 56s-vs-70s split that the stamps already
    # explained).  value_normalized is the total rescaled to a fixed
    # reference machine speed (CALIB_REF_SEC = the judge's idle-box
    # stamp from r7), and vs_prior carries like-for-like normalized
    # ratios against the newest committed BENCH_r*.json: ratio > ~1.2
    # on a code-unchanged query is a real regression, not noise.
    CALIB_REF_SEC = 0.138
    out["value_normalized"] = round(total * CALIB_REF_SEC / calib_best, 3)
    # The stdout line is the driver contract and the driver captures
    # only a bounded TAIL of stdout: r10's line embedded the O(#queries)
    # vs_prior map, outgrew the capture, and the whole round-over-round
    # section of PERF_r11.json came back empty (BENCH_r10.json
    # parsed=null; r11 verdict #1).  So the printed line now carries
    # ONLY the required fields plus the two scalar calibration stamps;
    # the vs_prior comparison (and anything else O(#queries) beyond the
    # required `queries` map) goes to the BENCH_SOLO_detail.json
    # sidecar.  Nothing is dropped — the sidecar holds the full object.
    detail = dict(out)
    prior = _latest_prior_artifact()
    if prior is not None:
        pname, pdata = prior
        pq, pcal = pdata.get("queries", {}), pdata.get("calib_sec")
        if pcal:
            shared = sorted(set(pq) & set(timings))
            ratios = {
                n: round((timings[n] / calib_best) / (pq[n] / pcal), 2)
                for n in shared
                if pq[n] > 0
            }
            now_shared = sum(timings[n] for n in shared)
            prior_shared = sum(pq[n] for n in shared)
            detail["vs_prior"] = {
                "artifact": pname,
                "prior_value": pdata.get("value"),
                "prior_calib_sec": pcal,
                "shared_queries": len(shared),
                "like_for_like_ratio_normalized": round(
                    (now_shared / calib_best) / (prior_shared / pcal), 3
                ),
                "per_query_ratio_normalized": ratios,
            }
            if pdata.get("calib_io_sec"):
                # raw I/O-stamp drift between the two runs — per-query
                # ratios stay normalized by the pure-compute stamp for
                # continuity with r1-r9 artifacts; this flags when the
                # I/O dimension moved independently
                detail["vs_prior"]["calib_io_ratio"] = round(
                    calib_io_best / pdata["calib_io_sec"], 3
                )
    try:
        with open(os.path.join(_REPO_ROOT, "BENCH_SOLO_detail.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # a read-only checkout still gets the stdout line
    print(json.dumps(out))


def _latest_prior_artifact() -> tuple[str, dict] | None:
    """Newest committed BENCH_r{N}.json in the repo root (env override:
    SPARK_GRAFT_BENCH_BASELINE=path), parsed; None if absent/corrupt."""
    import glob
    import re

    override = os.environ.get("SPARK_GRAFT_BENCH_BASELINE")
    if override:
        candidates = [override]
    else:
        # BENCH_SOLO_r{N}.json are builder-committed full copies of the
        # solo run's JSON line: the driver's BENCH_r{N}.json keeps only
        # a 2000-char tail of stdout, which the (vs_prior-bearing) line
        # outgrew in r8 — its per-query timings were truncated away and
        # parsed=None, silently aging the comparison baseline one round
        # per round.  Prefer the driver artifact when both parse (it is
        # canonical); the SOLO twin exists so a truncated driver round
        # still leaves a same-round baseline.
        def rkey(p: str) -> tuple[int, int]:
            m = re.search(r"BENCH_(SOLO_)?r(\d+)\.json$", p)
            if not m:
                return (-1, 0)
            return (int(m.group(2)), 0 if m.group(1) else 1)

        candidates = sorted(
            glob.glob(os.path.join(_REPO_ROOT, "BENCH_r*.json"))
            + glob.glob(os.path.join(_REPO_ROOT, "BENCH_SOLO_r*.json")),
            key=rkey,
            reverse=True,
        )
    for path in candidates:
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # the driver's artifact wraps bench's own JSON line in "parsed"
        if "queries" not in data and isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        if data.get("queries"):
            return os.path.basename(path), data
    return None


if __name__ == "__main__":
    main()
