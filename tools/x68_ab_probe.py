"""A/B probe: x68's window formulation vs the partial-agg/broadcast
formulation of the duplicated-gram flag, on the near-dup replica corpus
(the duplication-heavy extreme where the occurrence-sized window
exchange has no map-side reduction).

The registered `duplicate_spans` flags duplication with
min(doc)≠max(doc) OVER (PARTITION BY gram-key) — one occurrence-sized
exchange that must sort.  The alternative measured here collapses
(gram-key → min_doc, max_doc) through a map-side partial aggregation
first (distinct grams ≪ occurrences when duplication is high), keeps
only keys with min≠max, and joins that duplicated-key set back to the
positions — AQE broadcasts it while it fits the bar, skipping the
occurrence exchange entirely.  Identical output by construction; the
probe asserts the per-doc stats match before reporting times.

Usage::

    python tools/x68_ab_probe.py [N] [out_dir]   # default N=100
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def duplicate_spans_aggjoin(docs, w: int = 8):
    """The partial-agg/broadcast formulation (see module docstring)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.rounding import (
        round_fixed,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.text import (
        tokens,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        _ngrams,
    )

    toks = tokens("text")
    total = F.size(toks)
    base = docs.select(
        "doc_id",
        total.alias("__nt"),
        F.posexplode_outer(_ngrams(toks, total, w)).alias("__i", "__g"),
    ).select(
        "doc_id",
        "__nt",
        (F.col("__i") + 1).alias("pos"),
        F.col("__g").isNotNull().alias("__has_g"),
        F.when(F.col("__g").isNull(), F.col("doc_id")).otherwise(
            F.xxhash64("__g")
        ).alias("__k"),
    )
    dup_keys = (
        base.where("__has_g")
        .groupBy("__k")
        .agg(F.min("doc_id").alias("__dmin"), F.max("doc_id").alias("__dmax"))
        .where(F.col("__dmin") != F.col("__dmax"))
        .select("__k", F.lit(True).alias("__dup_k"))
    )
    flagged = base.join(
        dup_keys, (base["__has_g"]) & (base["__k"] == dup_keys["__k"]), "left"
    ).select(
        base["doc_id"],
        "__nt",
        "pos",
        F.coalesce(F.col("__dup_k"), F.lit(False)).alias("__dup"),
    )
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


def main() -> int:
    import json

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.quality import (
        duplicate_spans,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )
    import scale_probe

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = (
        sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_x68ab_{n}"
    )
    spark = get_spark(app_name="x68-ab-probe")
    scale_probe.build_docs_scaled(spark, n, out_dir)
    docs = spark.read.parquet(os.path.join(out_dir, "documents.parquet"))

    # equality first (order-insensitive): the two formulations must agree
    a = duplicate_spans(docs)
    b = duplicate_spans_aggjoin(docs)
    mismatch = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert mismatch == 0, f"formulations disagree on {mismatch} rows"

    results = {}
    for name, df_fn in (
        ("window", lambda: duplicate_spans(docs)),
        ("aggjoin", lambda: duplicate_spans_aggjoin(docs)),
    ):
        best = None
        for _ in range(2):
            t0 = time.time()
            df_fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        results[name] = round(best, 3)
        print(f"{name:8s} best-of-2 {best:8.3f}s", flush=True)
    results["n"] = n
    results["speedup_aggjoin"] = round(
        results["window"] / results["aggjoin"], 2
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "tools"))
    raise SystemExit(main())
