"""Connected components over an edge list — duplicate-cluster resolution.

LSH/near-dup detection (operators.dedup) emits *pairs*; canonicalizing a
corpus needs *clusters*: every document labeled with one representative
per transitively-connected group, so the pipeline can keep one doc per
cluster.  The reference has nothing iterative at all; Spark has no
built-in CC — this is an iterative DataFrame algorithm designed for
scale:

- min-label propagation: ``label(v) = min(label(v), min(label(u)) for
  u ~ v)``, repeated to fixpoint.  Each round is ONE shuffle (join
  labels to edges + groupBy min); rounds needed = graph diameter, and
  near-dup graphs are piles of tiny cliques (diameter ~1-2), so this
  settles in 2-3 rounds.  For adversarial long-chain graphs the
  large-star/small-star variant (Kiveris et al., "Connected Components
  in MapReduce", SoCC'14) halves diameter per round; not needed for the
  dedup workload this serves.
- convergence check is a single scalar ``sum(label)`` — monotonically
  non-increasing, strictly decreasing until fixpoint — instead of a
  full join-and-compare of consecutive labelings.
- ``localCheckpoint`` each round cuts the exponentially-growing lineage
  (a 10-round loop otherwise replans 10 nested shuffles).  The
  checkpoints are *non-eager*: the convergence-sum action materializes
  the checkpoint as a side effect, so each round is ONE Spark job
  (checkpoint + scalar agg fused) instead of two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id reachable from it.  Returns (node, component).
    Vertex ids must be orderable (use numeric ids).  Isolated vertices
    don't exist in an edge list; callers union them in if needed.

    When the deduplicated symmetric edge set fits the driver
    (``driver_max_edges``, default from conf
    ``spark.graft.cc.driverMaxEdges``, 2M edges ≈ 32 MB of longs —
    well under any sane maxResultSize), the components are computed by
    a driver-side union-find in ONE collect instead of 2–3 shuffle
    rounds of 2 jobs each: a near-dup edge list is dedup METADATA, a
    tiny fraction of the corpus, and driver-sized metadata is exactly
    what the driver should process itself (guide §5; r11 — x20's CC
    tail dropped 1.4 s → 0.3 s at sf0.1 with 715 edges).  The labels
    are identical by construction (min reachable id either way; pinned
    by the union-find differential test, which now exercises BOTH
    paths).  Corpora whose edge set exceeds the cap take the iterative
    path unchanged — the cap gates on the measured edge count, never
    on scale factor, so the switch is size-adaptive.

    Raises ``RuntimeError`` (iterative path) if the labeling is still
    changing after ``max_rounds`` (graph diameter > max_rounds, e.g. a
    long near-dup chain): plain min-label propagation would otherwise
    silently return split components.  Raise ``max_rounds`` or switch
    to a diameter-halving variant (large-star/small-star) for such
    graphs."""
    spark = edges.sparkSession
    if driver_max_edges is None:
        driver_max_edges = int(
            spark.conf.get("spark.graft.cc.driverMaxEdges", "2000000")
        )
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    if driver_max_edges > 0:
        # the count materializes the checkpoint — the same first job
        # the iterative path pays for its round-0 labels
        if sym.count() <= driver_max_edges:
            return _driver_union_find(spark, sym)
    labels = sym.groupBy("a").agg(F.min("b").alias("lbl")).select(
        F.col("a").alias("node"), F.least("node", "lbl").alias("component")
    )
    prev_sum = None
    for _ in range(max_rounds):
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        # pull each neighbour's current label across the edge, keep the min
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["a"], "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
        )
    else:
        # loop exhausted without the fixpoint break: verify the final
        # propagation round changed nothing, else labels are split.
        labels = labels.localCheckpoint(eager=False)
        final_sum = labels.agg(F.sum("component")).collect()[0][0]
        if final_sum != prev_sum:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} "
                "rounds (label sum still decreasing) — graph diameter "
                "exceeds max_rounds; raise it or use a diameter-halving "
                "formulation"
            )
    return labels


def _driver_union_find(spark, sym: DataFrame) -> DataFrame:
    """Exact (node, component) labels for a driver-sized symmetric
    edge set: union-find with path compression, representative = the
    component's minimum id (the min-label fixpoint the iterative path
    converges to).  Output schema copies the edge column's type."""
    from pyspark.sql.types import StructField, StructType

    from ..session import local_df

    # Arrow transfer + plain-int lists: a row-based collect() hands
    # back Row objects whose per-field access dominates the loop at
    # 10^5+ edges (measured r11: the 2M-edge default gate LOST to the
    # iterative path at ~590k edges on the row path); toPandas moves
    # the same longs columnar (falls back to the row path untyped on
    # sessions without Arrow — values identical either way).
    pdf = sym.toPandas()
    if pdf["a"].isna().any() or pdf["b"].isna().any():
        # Arrow hands a nullable int column back as float64 with NaN —
        # the NULL endpoint would silently become a float id / NaN
        # singleton component where the old row-based collect failed
        # loud (r11 ADVICE).  An edge list with NULL endpoints is a
        # caller bug either way; keep the failure explicit.
        raise ValueError(
            "connected_components: edge list contains NULL endpoints"
        )
    a_list = pdf["a"].tolist()
    b_list = pdf["b"].tolist()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(a_list, b_list):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so every root is its component's minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    dt = sym.schema["a"].dataType
    schema = StructType(
        [StructField("node", dt), StructField("component", dt)]
    )
    return local_df(
        spark, sorted((v, find(v)) for v in parent), schema
    )
