"""Persisted-IVF-PQ-index probe: at N× corpus volume, time ANN top-k
for a query batch (a) by re-deriving the model + re-encoding the corpus
in-plan (the x62 shape) vs (b) against the persisted index
(ivf_pq_topk_from_persisted — pushed __cell-IN scan over the
cell-range-laid-out codes table).  The r8 verdict's done-bar: the
scored persisted artifact's decade must reflect SCORING cost, not
retraining.

Usage: python tools/ivfpq_persist_probe.py [scaled_dir]
       # default /tmp/spark_graft_scale_emb1000 (build with
       # ``python tools/scale_probe.py 1000 --emb-only``)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    scaled = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/spark_graft_scale_emb1000"
    )
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (
        ivf_pq_build_index,
        ivf_pq_topk,
        ivf_pq_topk_from_persisted,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        _X62_K,
        _X62_NPROBE,
        _X62_NQ,
        _ivf_pq_model,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="ivfpq-persist-probe")
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    root = tempfile.mkdtemp(prefix="ivfpq_probe_")
    try:
        t0 = time.time()
        fin, cents, books, init = _ivf_pq_model(spark, scaled)
        model_s = time.time() - t0
        t0 = time.time()
        ivf_pq_build_index(fin, cents, books, root)
        build_s = time.time() - t0

        queries = (
            fin.orderBy(F.col("vec_id").asc())
            .offset(_X62_NQ)
            .limit(_X62_NQ)
            .localCheckpoint()  # pin: both paths score the same batch
        )
        t0 = time.time()
        n_rebuild = ivf_pq_topk(
            fin, queries, cents, books, k=_X62_K, nprobe=_X62_NPROBE
        ).count()
        rebuild_s = time.time() - t0
        t0 = time.time()
        n_persist = ivf_pq_topk_from_persisted(
            spark, root, queries, k=_X62_K, nprobe=_X62_NPROBE
        ).count()
        persist_s = time.time() - t0
        assert n_rebuild == n_persist, (n_rebuild, n_persist)

        # the x66 composition against the ARTIFACT: ANN candidate pool
        # from the persisted index (pushed cell scan) -> exact cosine
        # rerank of the |Q|·pool survivors -> greedy MMR.  This is the
        # production RAG shape whose pool stage must NOT grow with the
        # corpus (r8 verdict #2); the registered x66 re-encodes per
        # call (x62's shape) and its decade is encode-bound, so the
        # flat-scoring claim is pinned HERE.
        from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.rounding import (
            round_fixed,
        )
        from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.vectors import (
            cosine_staged,
            norm,
            usable_vec,
        )
        from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.similarity import (
            mmr_rerank,
        )
        from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
            _MMR_K,
            _MMR_LAM,
            _MMR_ONE_MINUS_LAM,
            _MMR_POOL,
        )
        from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
            load_table,
        )

        emb = load_table(spark, "embeddings", scaled)
        usable = emb.where(usable_vec(F.col("embedding")))
        t0 = time.time()
        cand = ivf_pq_topk_from_persisted(
            spark, root, queries, k=_MMR_POOL, nprobe=_X62_NPROBE
        )
        pool_df = (
            cand.join(
                usable.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("__qv"),
                    norm(F.col("embedding")).alias("__qn"),
                ),
                "query_id",
            )
            .join(
                usable.select(
                    F.col("vec_id").alias("cand_id"),
                    F.col("embedding").alias("__cv"),
                    norm(F.col("embedding")).alias("__cn"),
                ),
                "cand_id",
            )
            .select(
                "query_id",
                "cand_id",
                round_fixed(
                    cosine_staged(
                        F.col("__qv"),
                        F.col("__cv"),
                        F.col("__qn"),
                        F.col("__cn"),
                    ),
                    6,
                ).alias("rel"),
            )
        )
        n_mmr = mmr_rerank(
            emb,
            queries,  # unused when pool_df is supplied
            k=_MMR_K,
            lam=_MMR_LAM,
            one_minus_lam=_MMR_ONE_MINUS_LAM,
            pool_df=pool_df,
        ).count()
        mmr_s = time.time() - t0

        print(
            json.dumps(
                {
                    "scaled_dir": scaled,
                    "model_derive_sec": round(model_s, 3),
                    "build_once_sec": round(build_s, 3),
                    "reencode_batch_sec": round(rebuild_s, 3),
                    "persisted_batch_sec": round(persist_s, 3),
                    "speedup": round(rebuild_s / max(persist_s, 1e-9), 2),
                    "rows": n_persist,
                    "persisted_mmr_rerank_sec": round(mmr_s, 3),
                    "mmr_rows": n_mmr,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
