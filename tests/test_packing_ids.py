"""Edge-case tests for sequence packing and stable row enumeration.

The oracle-differential tests (test_driver_queries) prove fixture-wide
agreement with DuckDB; these pin the boundary semantics directly.
"""

from __future__ import annotations

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.ids import (
    stable_row_ids,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.packing import (
    pack_sequences,
)


def _pack(spark, rows, capacity=10, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(
        df, capacity=capacity, n_shards=n_shards
    ).orderBy("doc_id")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_pack_exact_boundary_does_not_straddle(spark):
    # doc 0 fills chunk 0 exactly [0,10); doc 1 must start chunk 1
    rows = [(0, " ".join(["w"] * 10)), (1, " ".join(["w"] * 3))]
    got = _pack(spark, rows)
    assert got[0]["offset"] == 0
    assert (got[0]["chunk_first"], got[0]["chunk_last"]) == (0, 0)
    assert got[1]["offset"] == 10
    assert (got[1]["chunk_first"], got[1]["chunk_last"]) == (1, 1)


def test_pack_long_doc_spans_chunks(spark):
    # 25 tokens starting at 7 → occupies [7, 32) → chunks 0..3
    rows = [(0, " ".join(["w"] * 7)), (1, " ".join(["w"] * 25))]
    got = _pack(spark, rows)
    assert got[1]["offset"] == 7
    assert (got[1]["chunk_first"], got[1]["chunk_last"]) == (0, 3)
    assert got[1]["n_chunks"] == 4


def test_pack_drops_empty_docs_and_shards_independently(spark):
    rows = [
        (0, "a b c"),
        (1, "   "),  # 0 tokens → dropped
        (2, "d e"),
        (3, "f"),
    ]
    got = _pack(spark, rows, capacity=4, n_shards=2)
    assert 1 not in got
    # shard 0: docs 0, 2 laid consecutively; shard 1: doc 3 alone
    assert got[0]["shard"] == 0 and got[0]["offset"] == 0
    assert got[2]["shard"] == 0 and got[2]["offset"] == 3
    assert got[3]["shard"] == 1 and got[3]["offset"] == 0


def test_stable_row_ids_dense_and_order_preserving(spark):
    df = spark.createDataFrame([(i,) for i in range(97)], "k long")
    out = stable_row_ids(df, "k", n_shards=5).collect()
    ids = sorted(r["row_id"] for r in out)
    assert ids == list(range(97))  # dense, gap-free
    # ids follow (shard, key) order
    by_order = sorted(out, key=lambda r: (r["shard"], r["k"]))
    assert [r["row_id"] for r in by_order] == list(range(97))


def test_stable_row_ids_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    a = {
        r["k"]: r["row_id"]
        for r in stable_row_ids(df.repartition(7), "k", n_shards=3).collect()
    }
    b = {
        r["k"]: r["row_id"]
        for r in stable_row_ids(df.coalesce(1), "k", n_shards=3).collect()
    }
    assert a == b


def test_shard_offsets_matches_window_semantics(spark):
    """The triangular-join offsets must equal the unpartitioned-window
    exclusive running sum they replaced — including NULLS FIRST
    ordering (a NULL shard's sums count toward every non-NULL shard's
    offset, and the NULL shard itself gets offset 0), multi-column
    sums, and re-derivation from live data on every execution."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.ids import (
        shard_offsets,
    )

    counts = spark.createDataFrame(
        [(None, 7, 100), (0, 3, 10), (1, 5, 20), (3, 2, 40)],
        "s long, n long, tok long",
    )
    got = {
        r["s"]: (r["n_off"], r["tok_off"])
        for r in shard_offsets(
            counts, "s", {"n": "n_off", "tok": "tok_off"}
        ).collect()
    }
    assert got == {
        None: (0, 0),
        0: (7, 100),
        1: (10, 110),
        3: (15, 130),
    }


def test_shard_offsets_empty_and_single(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.ids import (
        shard_offsets,
    )

    empty = spark.createDataFrame([], "s long, n long")
    assert shard_offsets(empty, "s", {"n": "off"}).count() == 0
    one = spark.createDataFrame([(5, 9)], "s long, n long")
    assert shard_offsets(one, "s", {"n": "off"}).collect()[0]["off"] == 0
