"""Structured Streaming incremental variant (SURVEY.md §2.10 T1-T5).

The reference's incremental semantics are Airflow constructs: monthly
catch-up runs (T1), Dataset-triggered downstream DAG (T2), a watermark it
reads but ignores (T3), latest-wins re-pull merge (T4), insert-if-absent
dims (T5).  Streaming-native equivalents:

- T1: a file source over the bronze directory — one JSON per arriving
  month; ``availableNow`` trigger gives the batch-backfill behaviour.
- T2: the gold merge runs in ``foreachBatch`` of the same stream — no
  external trigger plumbing.
- T3/T4: event-time watermark + the same latest-wins merge kernel the
  batch path uses (operators.merge.latest_wins) — one implementation,
  two drivers.
- plus watermarked tumbling-window aggregation over the events stream,
  which the reference lacks entirely.

At scale the ``foreachBatch`` merge targets partition-scoped parquet (or
a MERGE-capable table format); micro-batch size is bounded by arrival
cadence, not table size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.gold import build_gold
from ..plans.silver import bronze_to_silver
from ..schemas import RAW_GAME_SCHEMA


def stream_bronze_to_silver(
    spark: SparkSession, bronze_dir: str, schema: T.StructType = RAW_GAME_SCHEMA
) -> DataFrame:
    """File-source stream over monthly bronze JSON → silver columns.
    The transform is the *same pure function* as batch (plans.silver)."""
    raw = (
        spark.readStream.schema(schema)
        .option("multiLine", "true")
        .option("maxFilesPerTrigger", 1)  # one month per micro-batch
        .json(bronze_dir)
    )
    return bronze_to_silver(raw)


def run_incremental_gold(
    spark: SparkSession,
    bronze_dir: str,
    gold_dir: str,
    checkpoint_dir: str,
    username: str,
    run_ts: str,
) -> None:
    """Incremental gold build: each arriving bronze month merges into the
    gold fact with the latest-wins kernel; dims append-if-absent.
    ``availableNow`` processes the backlog then stops (the Airflow
    catchup=True equivalent)."""
    silver_stream = stream_bronze_to_silver(spark, bronze_dir)
    fact_path = os.path.join(gold_dir, "fact_games")

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        existing = None
        if os.path.exists(fact_path):
            existing = spark.read.parquet(fact_path)
        gold = build_gold(
            spark, batch_df, username, run_ts, existing_fact=existing
        )
        # localCheckpoint breaks lineage onto this batch's plan so the
        # overwrite below cannot read-from-while-writing
        fact = gold["fact_games"].localCheckpoint()
        fact.write.mode("overwrite").parquet(fact_path)

    (
        silver_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def streaming_tumbling_counts(
    spark: SparkSession,
    events_dir: str,
    window_size: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregate over the events stream —
    the same F.window expression as the batch operator
    (operators.windows.tumbling_agg), plus late-data bounds."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) as int64
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.readStream.schema(schema).parquet(events_dir)
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("raw_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "raw_sum",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame, table_name: str, output_mode: str = "complete"
) -> None:
    """Drain a streaming aggregate into an in-memory table with
    ``availableNow`` (process-everything-then-stop)."""
    (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
