"""Small-file compaction for partitioned parquet tables.

The 100 TB problem: incremental writers (streaming foreachBatch, a
micro-batch per arriving month, speculative retries) leave partitions
holding hundreds of KB-sized files; every later scan pays one task +
one footer read per file, and the driver pays listing time linear in
file count.  Compaction is the lakehouse maintenance op that bin-packs
each partition back to target-sized files (Delta OPTIMIZE / Iceberg
rewrite_data_files do exactly this).

Spark-first shape:

- file statistics come from the FileSystem API (driver-side listing of
  partition directories — metadata, never data);
- only partitions whose file count exceeds the target are rewritten
  (an already-compact partition is untouched — rewriting it would
  churn downstream caches and cost a full partition IO for nothing);
- each selected partition is rewritten through ONE narrow
  ``coalesce(ceil(bytes / target))`` pass — coalesce, not
  repartition: compaction must not shuffle, it only merges read
  splits into fewer write tasks;
- the rewrite lands via dynamic partition overwrite, so concurrent
  readers of OTHER partitions never see a hole.

Used with `sources.tables.write_parquet` partitioned layouts; pinned
by tests/test_layout.py (file count shrinks to the bin-packed target,
bytes within tolerance, data identical, untouched partitions keep
their files).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..session import local_df

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # the classic HDFS-block target


def partition_file_stats(
    spark: SparkSession, path: str
) -> list[tuple[str, int, int]]:
    """(partition_rel_path, n_files, total_bytes) per leaf directory of
    a partitioned parquet table — driver-side FileSystem metadata only.
    For an unpartitioned table, one entry with rel_path ''."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)

    def walk(p):  # -> list of (dir_path, [data files])
        files, subdirs = [], []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                subdirs.append(st.getPath())
            elif not name.startswith("_") and not name.startswith("."):
                files.append(st)
        if subdirs:
            out = []
            for d in subdirs:
                out.extend(walk(d))
            # Data files sitting NEXT TO subdirectories (mixed level —
            # e.g. an unpartitioned writer raced a partitioned one) are
            # still fragmentation; emit them rather than dropping them.
            if files:
                out.append((p, files))
            return out
        return [(p, files)] if files else []

    root_str = fs.makeQualified(root).toString()
    out = []
    for d, files in walk(root):
        rel = fs.makeQualified(d).toString()[len(root_str):].lstrip("/")
        out.append(
            (rel, len(files), sum(f.getLen() for f in files))
        )
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> list[str]:
    """Bin-pack every over-fragmented partition of a partitioned parquet
    table to ``ceil(total_bytes / target_bytes)`` files; returns the
    relative paths of the partitions rewritten.

    A partition qualifies when it holds MORE files than its bin-packed
    target (and at least ``min_files``) — compaction only ever reduces
    file count.  The rewrite reads just the selected partitions
    (partition-pruned scan), merges read splits with ``coalesce`` (no
    shuffle), and lands via dynamic partition overwrite so untouched
    partitions — and concurrent readers — are never disturbed."""
    stats = partition_file_stats(spark, path)
    todo = [
        (rel, n, b)
        for rel, n, b in stats
        if n >= min_files and n > max(1, math.ceil(b / target_bytes))
    ]
    rewritten = []
    for rel, n, b in todo:
        n_out = max(1, math.ceil(b / target_bytes))
        if rel == "":
            # Unpartitioned table (or data files at the root): Spark
            # cannot overwrite a path it is reading, so stage the
            # compacted copy through a sibling temp dir and swap it in
            # with a FileSystem rename (metadata-only on HDFS/local).
            tmp = path.rstrip("/") + ".__compacting__"
            spark.read.parquet(path).coalesce(n_out).write.mode(
                "overwrite"
            ).parquet(tmp)
            jvm = spark.sparkContext._jvm
            conf = spark.sparkContext._jsc.hadoopConfiguration()
            p_root = jvm.org.apache.hadoop.fs.Path(path)
            p_tmp = jvm.org.apache.hadoop.fs.Path(tmp)
            fs = p_root.getFileSystem(conf)
            fs.delete(p_root, True)
            fs.rename(p_tmp, p_root)
            rewritten.append(rel)
            continue
        # partition-pruned read of exactly this leaf; base-path keeps
        # the partition columns in the frame for the overwrite
        part_df: DataFrame = (
            spark.read.option("basePath", path).parquet(f"{path}/{rel}")
        )
        (
            part_df.coalesce(n_out)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )
        rewritten.append(rel)
    return rewritten


def maintain_table(
    spark: SparkSession,
    path: str,
    partition_by: list[str],
    zorder: tuple[str, str] | None = None,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """The lakehouse maintenance loop, one idempotent pass:
    ``fragmentation_report`` picks the over-fragmented partitions, and
    each is rewritten ONCE — bin-packed via ``compact_partitions`` when
    ``zorder`` is None, or z-order-clustered on ``zorder=(col_a, col_b)``
    (``operators.layout.write_zordered``) when given, so the single
    rewrite pays for both file-count AND scan-pruning health.

    The z-order rewrite stages each partition through an
    underscore-prefixed temp dir (invisible to parquet listing) and
    swaps it in with a FileSystem rename, so concurrent readers of
    OTHER partitions are never disturbed.  A second pass on a healthy
    table rewrites nothing — that is the idempotence contract pinned by
    tests/test_layout.py::test_maintain_table_end_to_end.

    Returns {"report": [Row…], "rewritten": [rel…]}.
    """
    from .layout import write_zordered

    report = fragmentation_report(spark, path, target_bytes).collect()
    if zorder is None:
        rewritten = compact_partitions(
            spark, path, partition_by, target_bytes, min_files
        )
        return {"report": report, "rewritten": rewritten}

    col_a, col_b = zorder
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    rewritten = []
    for r in report:
        if not (r["n_files"] >= min_files and r["n_files"] > r["target_files"]):
            continue
        rel = r["partition"]
        leaf = f"{path}/{rel}" if rel else path
        # rel == '': temp must live OUTSIDE path or the swap-delete
        # would remove it; rel != '': an underscore-prefixed sibling
        # inside the table is invisible to readers mid-maintenance.
        tmp = (
            path.rstrip("/") + ".__maintaining__"
            if rel == ""
            else f"{path}/_maint_{rel.replace('/', '_').replace('=', '_')}"
        )
        write_zordered(
            spark.read.parquet(leaf),
            col_a,
            col_b,
            tmp,
            n_files=int(r["target_files"]),
        )
        p_leaf = jvm.org.apache.hadoop.fs.Path(leaf)
        fs.delete(p_leaf, True)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), p_leaf)
        rewritten.append(rel)
    return {"report": report, "rewritten": rewritten}


def fragmentation_report(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> DataFrame:
    """The monitoring face: one row per partition with file count,
    bytes, and the bin-packed target — what an operator dashboards to
    decide when to run compaction."""
    rows = [
        (rel, n, b, max(1, math.ceil(b / target_bytes)))
        for rel, n, b in partition_file_stats(spark, path)
    ]
    return local_df(
        spark,
        rows,
        "partition string, n_files long, bytes long, target_files long",
    ).withColumn("fragmented", F.col("n_files") > F.col("target_files"))
