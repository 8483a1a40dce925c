"""Z-order layout tests: Morton-value python reference, grid-bucket
boundary exactness, the x54 pruning verdict, and the REAL write path's
parquet footer stats (the thing production pruning actually reads)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.layout import (
    Z_BITS,
    interleave_bits,
    write_zordered,
)

from tests.conftest import SF_DIR


def _ref_morton(a: int, b: int, bits: int = Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_interleave_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 100, 255) for b in (0, 3, 64, 200, 255)]
    df = spark.createDataFrame(rows, "a long, b long").withColumn(
        "z", interleave_bits(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r["z"] == _ref_morton(r["a"], r["b"])


def test_interleave_is_injective_on_the_grid(spark):
    # every (a, b) pair on the 256x256 grid gets a distinct z — checked
    # on a 64x64 subgrid to keep the test fast
    df = (
        spark.range(64)
        .withColumnRenamed("id", "a")
        .crossJoin(spark.range(64).withColumnRenamed("id", "b"))
        .withColumn("z", interleave_bits(F.col("a"), F.col("b")))
    )
    assert df.select("z").distinct().count() == 64 * 64


def test_x54_zorder_prunes_better_than_linear(spark):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.extensions import (
        x54_zorder_layout,
    )

    rows = x54_zorder_layout(spark, SF_DIR).collect()
    touched = {
        lay: sum(1 for r in rows if r["layout"] == lay and r["touched"])
        for lay in ("zorder", "linear")
    }
    files = {
        lay: sum(1 for r in rows if r["layout"] == lay)
        for lay in ("zorder", "linear")
    }
    # the 16x16 box overlaps at most 4 aligned Morton tiles; the linear
    # layout's slabs span the full second dimension, so it admits every
    # slab the first dimension allows (~16 of 256)
    assert touched["zorder"] <= 4
    assert touched["zorder"] < touched["linear"]
    assert files["zorder"] > 0 and files["linear"] > 0
    # per-file stats are consistent rectangles
    for r in rows:
        assert r["d1_min"] <= r["d1_max"] and r["d2_min"] <= r["d2_max"]


def _file_stats(path: str, col: str) -> list[tuple[int, int]]:
    """(min, max) of ``col`` per parquet file — what pruning reads."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out


def test_write_zordered_footer_stats_prune_second_dimension(spark, tmp_path):
    li = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select("l_partkey", "l_suppkey")
    )
    z_path = str(tmp_path / "zorder")
    lin_path = str(tmp_path / "linear")
    write_zordered(li, "l_partkey", "l_suppkey", z_path, n_files=8)
    (
        li.repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    smin, smax = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).first()
    # a second-dimension-only band predicate: an eighth of the range
    lo, hi = smin, smin + max((smax - smin) // 8, 0)

    def touched(path: str) -> tuple[int, int]:
        st = _file_stats(path, "l_suppkey")
        return sum(1 for mn, mx in st if mn <= hi and mx >= lo), len(st)

    z_hit, z_total = touched(z_path)
    lin_hit, lin_total = touched(lin_path)
    # partkey-sorted files each span the FULL suppkey range — the band
    # predicate prunes nothing; z-ordered files are rectangles, so the
    # same footer stats skip files
    assert lin_hit == lin_total
    assert z_hit < z_total
    # both layouts hold the same rows
    assert (
        spark.read.parquet(z_path).count()
        == spark.read.parquet(lin_path).count()
        == li.count()
    )


def test_compact_partitions_binpacks_fragmented_partitions(spark, tmp_path):
    """Compaction shrinks an over-fragmented partition to its bin-packed
    file target without touching compact partitions or changing data."""
    import os

    from pyspark.sql import functions as F

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.compact import (
        compact_partitions,
        fragmentation_report,
        partition_file_stats,
    )

    path = str(tmp_path / "tbl")
    # month=1: 12 tiny files (fragmented); month=2: 1 file (compact)
    m1 = spark.range(12_000).select(
        F.lit(1).alias("month"), F.col("id").alias("v")
    )
    m1.repartition(12).write.partitionBy("month").parquet(path)
    m2 = spark.range(500).select(F.lit(2).alias("month"), F.col("id").alias("v"))
    (
        m2.coalesce(1)
        .write.mode("append")
        .partitionBy("month")
        .parquet(path)
    )
    before = {rel: (n, b) for rel, n, b in partition_file_stats(spark, path)}
    assert before["month=1"][0] == 12 and before["month=2"][0] == 1
    rep = {r["partition"]: r["fragmented"] for r in
           fragmentation_report(spark, path).collect()}
    assert rep == {"month=1": True, "month=2": False}

    pre = sorted(
        (r["month"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    rewritten = compact_partitions(
        spark, path, ["month"], target_bytes=1 << 30
    )
    assert rewritten == ["month=1"]
    after = {rel: (n, b) for rel, n, b in partition_file_stats(spark, path)}
    assert after["month=1"][0] == 1          # bin-packed to target
    assert after["month=2"] == before["month=2"]  # untouched partition intact
    post = sorted(
        (r["month"], r["v"]) for r in spark.read.parquet(path).collect()
    )
    assert post == pre                        # data identical
    # idempotent: a compact table has nothing to rewrite
    assert compact_partitions(spark, path, ["month"], target_bytes=1 << 30) == []


def test_compact_unpartitioned_table_via_staged_swap(spark, tmp_path):
    """An unpartitioned table (rel '') can't be dynamic-overwritten while
    being read; compaction stages through a temp dir and swaps it in."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.compact import (
        compact_partitions,
        partition_file_stats,
    )

    path = str(tmp_path / "flat")
    spark.range(10_000).repartition(8).write.parquet(path)
    before = partition_file_stats(spark, path)
    assert before == [("", 8, before[0][2])]
    pre = sorted(r["id"] for r in spark.read.parquet(path).collect())
    rewritten = compact_partitions(spark, path, [], target_bytes=1 << 30)
    assert rewritten == [""]
    after = partition_file_stats(spark, path)
    assert after[0][1] == 1
    post = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert post == pre
    # the staging dir must not linger
    assert not os.path.exists(path + ".__compacting__")


def test_maintain_table_end_to_end_over_streaming_gold(spark, tmp_path):
    """The full lakehouse maintenance loop over the st04 streaming gold
    output: report → one z-ordered rewrite per fragmented partition →
    data query-identical, file counts at target, second pass a no-op."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.compact import (
        maintain_table,
        partition_file_stats,
    )
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources import demo
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        run_incremental_gold,
    )

    bronze = tmp_path / "bronze"
    bronze.mkdir()
    for m in (1, 2):
        demo.write_month_json(str(bronze / f"2024-{m:02d}-games.json"), month=m)
    run_incremental_gold(
        spark,
        str(bronze),
        str(tmp_path / "gold"),
        str(tmp_path / "ckpt"),
        demo.USERNAME,
        "2024-03-01 00:00:00",
    )
    fact = str(tmp_path / "gold" / "fact_games")
    # Simulate micro-batch churn: rewrite each month partition as many
    # small files (data identical — only the layout degrades).
    frag = str(tmp_path / "frag_fact")
    spark.read.parquet(fact).repartition(6).write.partitionBy(
        "year", "month"
    ).parquet(frag)
    pre = sorted(map(tuple, spark.read.parquet(frag).collect()))
    fragmented = {
        rel for rel, n, _ in partition_file_stats(spark, frag) if n > 1
    }
    assert fragmented  # the churn must actually fragment something

    res = maintain_table(
        spark,
        frag,
        ["year", "month"],
        zorder=("my_rating", "opponent_rating"),
        target_bytes=1 << 30,
    )
    assert set(res["rewritten"]) == fragmented
    assert all(
        n == 1 for _, n, _ in partition_file_stats(spark, frag)
    )  # bin-packed to target
    post = sorted(map(tuple, spark.read.parquet(frag).collect()))
    assert post == pre  # query-identical after maintenance
    # idempotent: a healthy table rewrites nothing
    res2 = maintain_table(
        spark,
        frag,
        ["year", "month"],
        zorder=("my_rating", "opponent_rating"),
        target_bytes=1 << 30,
    )
    assert res2["rewritten"] == []


def test_partition_file_stats_mixed_level_files_counted(spark, tmp_path):
    """Data files sitting NEXT TO partition subdirectories are still
    fragmentation — walk() must emit them, not drop them."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.compact import (
        partition_file_stats,
    )

    path = str(tmp_path / "mixed")
    spark.range(100).select(
        F.lit(1).alias("month"), F.col("id").alias("v")
    ).coalesce(1).write.partitionBy("month").parquet(path)
    # simulate a raced unpartitioned writer: a data file at the root
    spark.range(10).coalesce(1).write.parquet(str(tmp_path / "stray"))
    stray = glob.glob(str(tmp_path / "stray" / "part-*.parquet"))[0]
    os.replace(stray, os.path.join(path, "part-stray.parquet"))
    stats = {rel: n for rel, n, _ in partition_file_stats(spark, path)}
    assert stats == {"month=1": 1, "": 1}
