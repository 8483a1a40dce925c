"""Stage-level profile of x58_bm25_topk at the 1000x docs corpus
(r8 verdict #6: 136x is the worst corrected decade — is it the
irreducible tokenize term, or does the one-shot plan re-evaluate the
corpus-sized tf lineage for its several consumers the way x33's stats
projection did?).

The one-shot bm25_topk feeds the tf table to FOUR consumers: the score
join's probe side, the broadcast terms table, the derived query-term
limit, and the corpus scalars.  Each consumer that lands in a separate
job (broadcast materialization, collect) re-executes the
scan→tokenize→explode→groupBy lineage unless an exchange reuse
deduplicates it — this profile measures each stage alone and the full
query, so "tokenize-bound" vs "double-evaluated" is a measurement.

Usage: python tools/x58_profile.py [scaled_dir]
(default /tmp/spark_graft_scale_docs1000; build it first with
``python tools/scale_probe.py 1000 --docs-only``)

Measures, best-of-2 each through the noop sink:
  scan     — parquet scan + (doc_id, text) projection (I/O floor)
  tokenize — scan + tokens() + explode (no shuffle)
  tf       — tokenize + the (doc_id, token) groupBy shuffle
  terms    — tf + the vocab groupBy (the broadcast side's full cost)
  full     — the registered x58 (everything + score join + top-k)
and prints tf/vocab row counts for context.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    scaled = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/spark_graft_scale_docs1000"
    )
    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.text import (
        tokens,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.retrieval import (
        bm25_index,
        bm25_tf,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x58_bm25_topk,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="x58-profile")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()

    def docs():
        return load_table(spark, "documents", scaled)

    def tokenize_df():
        toks = tokens(F.coalesce(F.col("text"), F.lit("")))
        return docs().select(
            "doc_id",
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("token"),
        )

    def tf_df():
        return bm25_tf(docs())

    def terms_df():
        return bm25_index(tf_df())[0]

    variants = {
        "scan": lambda: docs().select("doc_id", "text"),
        "tokenize": tokenize_df,
        "tf": tf_df,
        "terms": terms_df,
        "full": lambda: x58_bm25_topk(spark, scaled),
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

    n_tf = tf_df().count()
    n_vocab = terms_df().count()
    print("tf rows:", n_tf, "vocab:", n_vocab)
    print("RESULTS", results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
