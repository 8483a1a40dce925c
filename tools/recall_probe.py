"""ANN recall-vs-nprobe probe on the planted-cluster fixture.

Measures, for IVF-PQ (x62's operator) on
sources/synthetic.clustered_embeddings — elongated clusters whose
members straddle cell boundaries, so nprobe has real work to do:

- coverage: fraction of exact top-5 inside the probed cells (the
  recall CEILING cell pruning imposes, independent of quantization);
- raw:      ADC recall@5 with codebooks trained on raw vectors;
- residual: ADC recall@5 with codebooks trained on IVF residuals
            (the IVFADC claim: residual > raw on clustered data).

Prints a markdown table for SCALE.md.  Run solo (timed probes share
the box).  Geometry matches tests/test_pq.py's pinned floors:
16 clusters × 32 members, dim 64, k-means 32 cells, PQ m=16 × k=64.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.clustering import (  # noqa: E402
    kmeans,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.pq import (  # noqa: E402
    ivf_pq_topk,
    ivf_residuals,
    pq_codebooks_train,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.synthetic import (  # noqa: E402
    cluster_center_queries,
    clustered_embeddings,
)

PER_CLUSTER, N_CELLS, M, KCODES, ROUNDS, K = 32, 32, 16, 64, 3, 5


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    centers, full = clustered_embeddings(spark, per_cluster=PER_CLUSTER)
    corpus = full.select("vec_id", "embedding").cache()
    queries = cluster_center_queries(spark, centers, n_queries=16)

    rows = corpus.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows])
    qrows = queries.collect()
    exact = {}
    for qr in qrows:
        qv = np.array(list(qr.embedding))
        d = ((X - qv) ** 2).sum(axis=1)
        exact[qr.vec_id] = set(ids[np.argsort(d, kind="stable")[:K]])

    _, cents = kmeans(corpus, k=N_CELLS, rounds=ROUNDS)
    residuals = ivf_residuals(corpus, cents)

    C = np.array([v for _, v in cents])
    cid = np.array([c for c, _ in cents])
    assign = cid[((X[:, None, :] - C[None]) ** 2).sum(axis=2).argmin(axis=1)]
    id2cell = dict(zip(ids, assign))

    def coverage(nprobe: int) -> float:
        cov = []
        for qr in qrows:
            qv = np.array(list(qr.embedding))
            order = np.argsort(((C - qv) ** 2).sum(axis=1), kind="stable")
            probed = set(cid[order[:nprobe]])
            cov.append(
                sum(1 for i in exact[qr.vec_id] if id2cell[i] in probed) / K
            )
        return float(np.mean(cov))

    def recall(books, nprobe: int, residual: bool) -> float:
        got = ivf_pq_topk(
            corpus, queries, cents, books, k=K, nprobe=nprobe,
            residual=residual,
        ).collect()
        by_q: dict = {}
        for r in got:
            by_q.setdefault(r.query_id, set()).add(r.cand_id)
        return float(
            np.mean([len(by_q.get(q, set()) & exact[q]) / K for q in exact])
        )

    # two code budgets: the LOOSE one (m=16 — the floor tests/test_pq.py
    # pins) and the TIGHT one (m=8 — where residual encoding's advantage
    # is structural: raw books must spend codes memorizing 16 cluster
    # centers and lose the axis position, residual books spend all of
    # them on the axis)
    for m in (16, 8):
        books_raw = pq_codebooks_train(corpus, m=m, k=KCODES, rounds=ROUNDS)
        books_res = pq_codebooks_train(
            residuals, m=m, k=KCODES, rounds=ROUNDS
        )
        print(
            f"\nIVF-PQ recall@{K} on planted elongated clusters "
            f"(16×{PER_CLUSTER}, dim 64, {N_CELLS} cells, "
            f"m={m}, k={KCODES}):\n"
        )
        print("| nprobe | coverage ceiling | raw PQ | residual (IVFADC) |")
        print("|---|---|---|---|")
        for nprobe in (1, 2, 4, 8):
            print(
                f"| {nprobe} | {coverage(nprobe):.3f} "
                f"| {recall(books_raw, nprobe, False):.3f} "
                f"| {recall(books_res, nprobe, True):.3f} |"
            )


if __name__ == "__main__":
    main()
