"""Deterministic synthetic embedding corpora for ANN evaluation.

The driver fixtures' embeddings are ISOTROPIC random vectors — the
worst case for every quantizer (no structure to exploit; the pq/ivf
recall pins there deliberately assert only "much better than random").
Real production embeddings are CLUSTERED, and that is where IVF cell
pruning and residual (IVFADC) encoding earn their keep.  This module
generates a planted-cluster corpus with a KNOWN neighbor structure so
recall can be pinned at production-grade levels instead of eyeballed.

Geometry (chosen so the benchmark can't lie):

- ``n_clusters`` centers drawn uniform in [-1, 1]^dim (typical
  inter-center distance ~ sqrt(2·dim/3) ≈ 6.5 at dim=64);
- each cluster is ELONGATED: member = center + t·L·u_c + small noise,
  with u_c a per-cluster unit direction and t ~ uniform(-1, 1).  A
  k-means with more cells than clusters therefore SPLITS each cluster
  along its long axis — a center-placed query's true neighbors (the
  smallest-|t| members) straddle two cells, so recall genuinely RISES
  with nprobe instead of saturating at 1 probe (the production
  cells ≠ semantic-clusters regime);
- ids are SHUFFLED so id order carries no information about rank —
  lower-id tie-breaking can never reconstruct the ground truth by
  accident (the first fixture draft had ids aligned with the noise
  ladder and "achieved" recall 1.0 on ties alone);
- raw PQ has 16 codes per subspace against 16 cluster centers × a
  continuum of t — it can at best memorize the centers and lose t,
  so the residual (IVFADC) variant measurably beats it here, which is
  exactly the claim operators/pq.py makes for clustered data.

Everything derives from one seeded ``random.Random`` — byte-identical
across runs and processes, no RNG state to ship.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession
from ..session import local_df


def clustered_embeddings(
    spark: SparkSession,
    n_clusters: int = 16,
    per_cluster: int = 64,
    dim: int = 64,
    elongation: float = 3.0,
    noise: float = 0.005,
    seed: int = 0xC1A5,
) -> tuple[list[list[float]], DataFrame]:
    """(cluster centers, corpus DataFrame(vec_id long, embedding
    array<double>, cluster int, t double)) — the planted elongated-
    cluster ANN fixture.  ``t`` is the member's signed position along
    its cluster's long axis (ground truth for neighbor ranking: a
    center query's exact top-k are the smallest |t| members up to the
    isotropic noise floor)."""
    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1.0, 1.0) for _ in range(dim)]
        for _ in range(n_clusters)
    ]
    dirs = []
    for _ in range(n_clusters):
        v = [rng.gauss(0.0, 1.0) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        dirs.append([x / n for x in v])
    ids = list(range(n_clusters * per_cluster))
    rng.shuffle(ids)
    rows = []
    for c in range(n_clusters):
        for i in range(per_cluster):
            t = rng.uniform(-1.0, 1.0)
            vec = [
                centers[c][d]
                + t * elongation * dirs[c][d]
                + rng.gauss(0.0, noise)
                for d in range(dim)
            ]
            rows.append((ids[c * per_cluster + i], vec, c, t))
    return centers, local_df(
        spark, rows, "vec_id long, embedding array<double>, cluster int, t double"
    )


def cluster_center_queries(
    spark: SparkSession,
    centers: list[list[float]],
    n_queries: int = 8,
    noise: float = 0.01,
    id_base: int = 1_000_000,
    seed: int = 0x9E1D,
) -> DataFrame:
    """One near-center query per cluster for the first ``n_queries``
    clusters; ids start at ``id_base`` so they can never collide with
    (and thus never self-exclude against) corpus ids."""
    rng = random.Random(seed)
    rows = [
        (
            id_base + c,
            [v + rng.gauss(0.0, noise) for v in centers[c]],
        )
        for c in range(min(n_queries, len(centers)))
    ]
    return local_df(spark, rows, "vec_id long, embedding array<double>")
