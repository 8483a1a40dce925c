"""Stage-level profile of x33_token_budget_select at the 1000x docs
corpus (r7 verdict #5): is the 1000x ratio the per-shard sort+cumsum
window (fixable by sub-sharding), the text-function scan (quality_score
+ bpe_ish_token_count — irreducible without changing the functions), or
shard skew (fixable by rebalancing)?

Usage: python tools/x33_profile.py [scaled_dir]
(default /tmp/spark_graft_scale_docs1000; build it first with
``python tools/scale_probe.py 1000 --docs-only``)

Measures, best-of-2 each through the noop sink:
  scan   — parquet scan + coalesce(text) only (I/O floor)
  stats  — scan + quality_score + bpe_ish_token_count projection
  window — stats + quality-bucket shard + rank/cumsum window
  full   — the registered x33 (window + offsets join + selection)
and prints the per-shard row histogram (skew check).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_docs1000"
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.text import (
        bpe_ish_token_count,
        quality_score,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.selection import (
        N_QSHARDS,
        x33_token_budget_select,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import get_spark
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="x33-profile")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()

    def docs():
        return load_table(spark, "documents", scaled).withColumn(
            "text", F.coalesce(F.col("text"), F.lit(""))
        )

    def stats_df():
        return docs().select(
            "doc_id",
            quality_score("text").alias("quality"),
            bpe_ish_token_count("text").cast("bigint").alias("n_bpe_tokens"),
        )

    def window_df():
        qshard = F.least(
            F.floor((F.lit(1.0) - F.col("quality")) * N_QSHARDS),
            F.lit(N_QSHARDS - 1),
        ).cast("long")
        base = stats_df().withColumn("__shard", qshard)
        w = Window.partitionBy("__shard").orderBy(
            F.desc("quality"), F.asc("doc_id")
        )
        return base.withColumn("__rank", F.row_number().over(w)).withColumn(
            "__cum",
            F.sum("n_bpe_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )

    variants = {
        "scan": lambda: docs().select("doc_id", "text"),
        "stats": stats_df,
        "window": window_df,
        "full": lambda: x33_token_budget_select(spark, scaled),
    }
    results = {}
    for name, fn in variants.items():
        best = None
        for _ in range(2):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 3)
        print(f"{name:8s} {best:8.3f}s", flush=True)

    qshard = F.least(
        F.floor((F.lit(1.0) - F.col("quality")) * N_QSHARDS),
        F.lit(N_QSHARDS - 1),
    ).cast("long")
    hist = (
        stats_df()
        .withColumn("__shard", qshard)
        .groupBy("__shard")
        .count()
        .orderBy("__shard")
        .collect()
    )
    counts = [r["count"] for r in hist]
    print(
        "shards:", len(counts),
        "max:", max(counts),
        "mean:", round(sum(counts) / len(counts)),
        "skew(max/mean):", round(max(counts) / (sum(counts) / len(counts)), 2),
    )
    print({r["__shard"]: r["count"] for r in hist})
    print("RESULTS", results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
