"""Warehouse load (the reference's DAG 2, gold → warehouse star schema).

The reference reads a high watermark from the warehouse
(get_last_updated_date.sql via XCom, load_data_warehouse_dag.py:37-42)
and then IGNORES it, full-replacing every table from pandas
(python_scripts.py:629-676).  Per SURVEY.md §2.11.5 this engine honors
the watermark: only fact rows newer than the warehouse's max
last_updated are read, and they merge latest-wins by game_url — the
incremental load the reference intended.

Target here is the session catalog (S9 DDL) so the flow is testable
offline; against PostgreSQL the same functions take the JDBC reader/
writer (sources.tables.read_jdbc/write_jdbc) — the watermark read pushes
down as a subquery, and the merge becomes MERGE-on-key on engines that
support it.  At 100 TB the incremental delta, not the table, is the unit
of work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import insert_if_absent, latest_wins
from ..sources.tables import WAREHOUSE_SCHEMA, create_warehouse

DIM_KEYS = {
    "dim_openings": ["pgn_eco_url"],
    "dim_date": ["game_date"],
    "dim_time_control": ["time_control"],
    "dim_results": ["result_code"],
}


def read_watermark(spark: SparkSession, schema: str = WAREHOUSE_SCHEMA):
    """High-watermark read (A4/T3): max last_updated already loaded, or
    None on an empty warehouse.  Over JDBC this whole aggregate pushes
    down as a subquery-dbtable."""
    fact = spark.table(f"{schema}.fact_games")
    return fact.agg(F.max("last_updated").alias("wm")).collect()[0].wm


def load_warehouse(
    spark: SparkSession,
    gold: dict[str, DataFrame],
    location: str | None = None,
    schema: str = WAREHOUSE_SCHEMA,
) -> None:
    """Incremental warehouse load: DDL if absent, insert-if-absent dims,
    watermark-filtered latest-wins fact merge."""
    create_warehouse(spark, location=location, schema=schema)

    for dim, keys in DIM_KEYS.items():
        existing = spark.table(f"{schema}.{dim}")
        target_cols = existing.columns
        incoming = gold[dim].select(*target_cols)
        merged = insert_if_absent(existing, incoming, keys)
        # localCheckpoint breaks lineage off the table being overwritten
        merged.localCheckpoint().write.insertInto(f"{schema}.{dim}", overwrite=True)

    fact_table = f"{schema}.fact_games"
    existing_fact = spark.table(fact_table)
    wm = read_watermark(spark, schema)
    incoming = gold["fact_games"].select(*existing_fact.columns)
    if wm is not None:
        incoming = incoming.where(F.col("last_updated") > F.lit(wm))
    merged = latest_wins(existing_fact, incoming, ["game_url"], "last_updated")
    merged.localCheckpoint().write.insertInto(fact_table, overwrite=True)
