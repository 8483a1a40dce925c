"""Properties of the sampling/split, connected-components, and sketch
operators (operators/sampling.py, operators/graph.py, x21)."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.graph import (
    connected_components,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
    load_table,
)

from .conftest import SF_DIR


def test_hash_split_partition_properties(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    splits = {"train": 80, "val": 10, "test": 10}
    labeled = hash_split(docs, "doc_id", splits)
    counts = {r["split"]: r["n"] for r in labeled.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = docs.count()
    # exhaustive + disjoint: every row labeled exactly once
    assert sum(counts.values()) == total
    # proportions roughly honored (md5 buckets are uniform; 500 docs)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] / total - 0.8) < 0.08
    # stable: recomputation and repartitioning never move a row
    again = hash_split(docs.repartition(13), "doc_id", splits)
    assert labeled.exceptAll(again).count() == 0


def test_deterministic_sample_nested_and_stable(spark):
    docs = load_table(spark, "documents", SF_DIR).select("doc_id")
    s10 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 10).collect()}
    s20 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 20).collect()}
    assert s10 <= s20  # growing the rate only adds rows
    assert s10 == {
        r.doc_id for r in deterministic_sample(docs, "doc_id", 10).collect()
    }
    other_seed = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 10, seed="other").collect()
    }
    assert other_seed != s10  # reseeding re-deals


def _union_find_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {n: find(n) for n in parent}


def test_connected_components_matches_union_find(spark):
    """Differential vs a reference union-find, on BOTH execution
    paths: the driver-side fast path (edge set under the cap) and the
    iterative min-propagation path (cap forced to 0)."""
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    want = _union_find_components(edges)
    for cap in (None, 0):  # None = conf default (driver path here)
        got = {
            r.node: r.component
            for r in connected_components(
                df, driver_max_edges=cap
            ).collect()
        }
        assert got == want, f"driver_max_edges={cap}"


def test_connected_components_long_chain(spark):
    """Worst case for min-propagation: a single path graph (diameter =
    n-1).  Rounds double the reach of the min label only by one hop, so
    this pins that max_rounds is honored and convergence is exact.
    driver_max_edges=0 forces the iterative path (the driver fast path
    has no notion of rounds); the default path is pinned too."""
    n = 20
    df = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(n - 1)])
    for cap in (None, 0):
        got = {
            r.node: r.component
            for r in connected_components(
                df, driver_max_edges=cap
            ).collect()
        }
        assert got == {i: 0 for i in range(n)}, f"driver_max_edges={cap}"


def test_connected_components_null_endpoint_raises(spark):
    """NULL edge endpoints must fail LOUD on the driver path: the
    Arrow transfer would otherwise degrade the id column to float64
    and emit NaN singleton components silently (r11 ADVICE)."""
    import pytest

    df = spark.createDataFrame(
        [(1, 2), (3, None)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="NULL endpoints"):
        connected_components(df)


def test_connected_components_nonconvergence_raises(spark):
    """A diameter-11 path cannot settle in 3 rounds: the guard must
    refuse to return silently-split components.  (Iterative path only
    — the driver fast path computes the exact answer in one pass.)"""
    import pytest

    df = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(11)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=3, driver_max_edges=0)


def test_approx_sketches_error_bounds(spark):
    """x21's bounded-error contract: every sketch must land inside its
    published bound (the same flags the driver oracle hash-checks).
    x21 is scored through x21_sketch_suite now — the fine-grained form
    lives in FULL_QUERIES."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

    rows = suites.FULL_QUERIES["x21_approx_sketches"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.acd_within_3sigma, r
        assert r.q50_within_2pct, r
        assert r.q95_within_2pct, r
        assert r.n_orders >= r.exact_customers > 0


def test_deterministic_ops_are_layout_invariant(spark):
    """In-suite pin of the layout-invariance contract (CONTRACTS.md;
    full 9-operator sweep in tools/partition_probe.py): identical
    output whether the input arrives as 1, 5, or 16 partitions — the
    divergence class task retries and speculation expose at scale."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.ids import (
        stable_row_ids,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    for op in (
        lambda d: hash_split(d, "doc_id", {"train": 80, "val": 10, "test": 10}),
        lambda d: deterministic_sample(d, "doc_id", 25),
        lambda d: stable_row_ids(d, "doc_id"),
        lambda d: pack_sequences(d),
    ):
        base = canon(op(docs.repartition(1)))
        assert base == canon(op(docs.repartition(5)))
        assert base == canon(op(docs.repartition(16)))
        assert base  # non-empty — the comparison must be over real rows
