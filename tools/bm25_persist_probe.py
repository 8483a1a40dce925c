"""Persisted-BM25-index probe: at N× corpus volume, time scoring a
SECOND query batch (a) by rebuilding the index in-plan (the pre-r7 x58
shape) vs (b) against the persisted artifacts (bm25_topk_from_index —
token-IN pushdown over the range-laid-out tf table).  The r6 verdict's
done-bar: persisted ≥10× cheaper than rebuild.

Usage: python tools/bm25_persist_probe.py [scaled_dir]
       # default /tmp/spark_graft_scale_x100 (build with scale_probe)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_x100"
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.retrieval import (
        bm25_build_index,
        bm25_topk,
        bm25_topk_from_index,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import get_spark
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="bm25-persist-probe")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    docs = load_table(spark, "documents", scaled)
    root = tempfile.mkdtemp(prefix="bm25_probe_")
    try:
        t0 = time.time()
        bm25_build_index(docs, root)  # paid once, amortized over batches
        build_s = time.time() - t0

        terms = spark.read.parquet(os.path.join(root, "terms"))
        ranked = (
            terms.orderBy(F.col("cnt").desc(), F.col("token").asc())
            .collect()
        )
        out = {"scaled_dir": scaled, "build_once_sec": round(build_s, 3)}
        # two batch shapes: "hot" = terms ranked 9..16 (x61's scored
        # contract — worst case for pruning: the fixture vocab is ~130
        # tokens, so these cover ~25% of all postings) and "tail" = the
        # 8 rarest terms (the realistic retrieval shape: specific terms,
        # small postings — where the token-range pruning shines)
        for label, batch in (("hot", ranked[8:16]), ("tail", ranked[-8:])):
            queries = spark.createDataFrame(
                [(r["token"], [r["token"]]) for r in batch],
                "query string, terms array<string>",
            )
            t0 = time.time()
            n_rebuild = bm25_topk(docs, queries, k=5).count()
            rebuild_s = time.time() - t0
            t0 = time.time()
            n_persist = bm25_topk_from_index(spark, root, queries, k=5).count()
            persist_s = time.time() - t0
            assert n_rebuild == n_persist, (label, n_rebuild, n_persist)
            out[label] = {
                "rebuild_batch_sec": round(rebuild_s, 3),
                "persisted_batch_sec": round(persist_s, 3),
                "speedup": round(rebuild_s / max(persist_s, 1e-9), 2),
                "rows": n_persist,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps(out))
    return 0



if __name__ == "__main__":
    raise SystemExit(main())
