"""S1 at-scale fetch (sources.tables.fetch_archives): the (user, month)
fan-out must spread across partitions and produce rows schema-identical
to the S2 declared-schema bronze scan.  Offline by construction — the
injected fetcher serves sources.demo payloads from local files through
the exact plumbing the live HTTP fetcher uses."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.schemas import RAW_GAME_SCHEMA
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources import demo
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
    fetch_archives,
    read_json,
)

USERS = ["Rhythmbear1", "opponent042"]
MONTHS = [1, 2, 3]


def _payload_dir(tmp_path):
    d = tmp_path / "archives"
    d.mkdir()
    for u in USERS:
        for m in MONTHS:
            # distinct per-user game counts so misrouted fetches show up
            games = demo.month_payload(m, n=10 + 3 * USERS.index(u))
            (d / f"{u.lower()}_2024_{m:02d}.json").write_text(
                json.dumps(games)
            )
    return str(d)


def _file_fetcher(root: str):
    def fetch(username: str, year: int, month: int) -> list[dict]:
        p = os.path.join(root, f"{username.lower()}_{year}_{month:02d}.json")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    return fetch


def test_fetch_fans_out_and_matches_bronze_schema(spark, tmp_path):
    root = _payload_dir(tmp_path)
    user_months = spark.createDataFrame(
        [(u, 2024, m) for u in USERS for m in MONTHS],
        "username string, year int, month int",
    )
    got = fetch_archives(
        spark, user_months, fetcher=_file_fetcher(root), partitions=4
    )

    # schema-identical to the S2 bronze scan of the same payload shape
    bronze_path = str(tmp_path / "bronze.json")
    with open(bronze_path, "w") as f:
        json.dump(demo.month_payload(1, n=5), f)
    bronze = read_json(spark, bronze_path, RAW_GAME_SCHEMA)
    assert got.drop("username", "year", "month").schema == bronze.schema

    # every user-month landed, with its own game count (no misrouting)
    counts = {
        (r["username"], r["month"]): r["n"]
        for r in got.groupBy("username", "month")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {
        (u, m): 10 + 3 * USERS.index(u) for u in USERS for m in MONTHS
    }

    # the fan-out is real: the six user-months execute on >1 partition
    # (spark_partition_id survives the narrow post-fetch projections)
    pids = {
        r["pid"]
        for r in got.withColumn("pid", F.spark_partition_id())
        .select("pid")
        .distinct()
        .collect()
    }
    assert len(pids) > 1, f"all fetches collapsed onto one partition: {pids}"

    # nested payload survived the JVM-side parse (struct access works)
    sample = got.where(F.col("month") == 2).select(
        "uuid", F.col("white.rating").alias("wr")
    )
    assert sample.where(F.col("wr").isNull()).count() == 0


def test_fetch_missing_month_yields_no_rows(spark, tmp_path):
    root = _payload_dir(tmp_path)
    user_months = spark.createDataFrame(
        [("Rhythmbear1", 2024, 11)],  # no file for November
        "username string, year int, month int",
    )
    got = fetch_archives(
        spark, user_months, fetcher=_file_fetcher(root), partitions=2
    )
    assert got.count() == 0
    # empty result still carries the full declared schema
    assert "pgn" in got.columns and "white" in got.columns


def test_streaming_archive_ingest_equals_batch_fetch(spark, tmp_path):
    """S1 x T1: micro-batched request draining must append exactly the
    rows the one-shot batch fetch produces over the same requests."""
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        streaming_archive_ingest,
    )

    root = _payload_dir(tmp_path)
    requests_dir = str(tmp_path / "requests")
    # two files -> two micro-batches under maxFilesPerTrigger=1
    spark.createDataFrame(
        [(USERS[0], 2024, m) for m in MONTHS],
        "username string, year int, month int",
    ).coalesce(1).write.mode("overwrite").parquet(requests_dir)
    spark.createDataFrame(
        [(USERS[1], 2024, m) for m in MONTHS],
        "username string, year int, month int",
    ).coalesce(1).write.mode("append").parquet(requests_dir)

    bronze = str(tmp_path / "bronze_stream")
    streaming_archive_ingest(
        spark,
        requests_dir,
        bronze,
        str(tmp_path / "ckpt"),
        fetcher=_file_fetcher(root),
        partitions=4,
    )
    got = spark.read.parquet(bronze)
    want = fetch_archives(
        spark,
        spark.read.parquet(requests_dir),
        fetcher=_file_fetcher(root),
        partitions=4,
    )
    assert got.schema == want.schema
    key = lambda df: sorted(  # noqa: E731
        (r["username"], r["month"], r["uuid"]) for r in df.collect()
    )
    assert key(got) == key(want)
    assert got.count() == sum(10 + 3 * USERS.index(u) for u in USERS) * len(
        MONTHS
    )
