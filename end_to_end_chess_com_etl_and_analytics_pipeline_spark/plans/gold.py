"""Silver → gold star builder (SURVEY.md §2 J1-J3, P3, F6-F9, D2-D6; §2.11).

Reproduces the reference's four dimension loads (python_scripts.py:221-488)
and fact build (python_scripts.py:491-603) as pure DataFrame→DataFrame
functions.  Deliberate, documented divergences from the reference
(SURVEY.md §2.11):

- opening names derive from the ECOUrl slug (and optionally a broadcast
  openings lookup) instead of an HTTP GET + HTML parse per row
  (udfs.py:138-151) — deterministic and offline.
- the "my side" comparison is case-insensitive on a parameterized
  username (the reference hardcodes the display-cased literal
  'Rhythmbear1', python_scripts.py:541-558).
- DISTINCT applies on both create and append paths of every dim (the
  reference drops it on one branch of dim_time_control,
  python_scripts.py:414-418).

At scale: dims are broadcast-sized; the fact merge shuffles once on
game_url; gold is partitioned by (year, month) so a monthly arrival
rewrites only its partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pgn import (
    format_time_control,
    opening_family,
    opening_name_from_url,
    opening_variation,
    pgn_depth,
)
from ..operators.merge import insert_if_absent, latest_wins
from ..sources.tables import dim_results_seed


def build_dim_openings(
    silver: DataFrame, openings_lookup: DataFrame | None = None
) -> DataFrame:
    """dim_openings (python_scripts.py:256-282): distinct opening URL →
    name/family/variation/eco.  With ``openings_lookup`` (the 3.5k-row
    openings.csv), canonical names come from a broadcast join on the
    slug-derived name; otherwise the slug name stands alone."""
    name = opening_name_from_url(F.col("pgn_eco_url"))
    dim = silver.select(
        "pgn_eco_url",
        name.alias("opening_name"),
        opening_family(name).alias("opening_family"),
        opening_variation(name).alias("opening_variation"),
        F.col("pgn_eco").alias("eco_code"),
    ).distinct()
    if openings_lookup is not None:
        # canonical `Family: Variation` punctuation where the lookup has it
        lk = openings_lookup.select(
            F.regexp_replace(F.col("name"), r"[:,]", "").alias("__flat"),
            F.col("name").alias("__canon"),
        ).dropDuplicates(["__flat"])
        dim = (
            dim.join(
                F.broadcast(lk),
                F.regexp_replace(dim.opening_name, r"[:,]", "") == lk.__flat,
                "left",
            )
            .withColumn("opening_name", F.coalesce("__canon", "opening_name"))
            .withColumn("opening_family", opening_family(F.col("opening_name")))
            .withColumn("opening_variation", opening_variation(F.col("opening_name")))
            .drop("__flat", "__canon")
        )
    return dim


def build_dim_date(silver: DataFrame) -> DataFrame:
    """dim_date (python_scripts.py:326-366): distinct game dates with
    parts; quarter via the reference's CASE/BETWEEN (F8)."""
    month = F.month("game_date")
    return (
        silver.select("game_date")
        .where(F.col("game_date").isNotNull())
        .distinct()
        .select(
            "game_date",
            F.year("game_date").alias("year"),
            month.alias("month"),
            F.date_format("game_date", "MMMM").alias("month_name"),
            F.dayofmonth("game_date").alias("day"),
            F.date_format("game_date", "EEEE").alias("weekday"),
            F.when(month.between(1, 3), 1)
            .when(month.between(4, 6), 2)
            .when(month.between(7, 9), 3)
            .otherwise(4)
            .alias("quarter"),
        )
    )


def build_dim_time_control(silver: DataFrame) -> DataFrame:
    """dim_time_control (python_scripts.py:394-443): distinct formatted
    control → time_class (DISTINCT on every path, §2.11.2)."""
    return silver.select(
        format_time_control(F.col("time_control")).alias("time_control"),
        "time_class",
    ).distinct()


def build_dim_results(spark: SparkSession) -> DataFrame:
    """dim_results static seed (S11) — idempotent create-if-absent in
    deployment (§2.11.1)."""
    return dim_results_seed(spark)


def _my(white_expr: Column, black_expr: Column, username: str) -> Column:
    is_white = F.lower(F.col("pgn_white_user")) == username.lower()
    return F.when(is_white, white_expr).otherwise(black_expr)


def build_fact(silver: DataFrame, username: str, run_ts: str) -> DataFrame:
    """fact_games projection (python_scripts.py:533-564): role-playing
    CASEs pivot white/black columns into my/opponent columns; duration in
    seconds (F9); move count (D5); run-timestamp audit column (F12,
    parameterized — never interpolated SQL)."""
    u = username
    return silver.select(
        "game_url",
        "game_date",
        "start_time",
        "end_time",
        (F.unix_timestamp("end_time") - F.unix_timestamp("start_time"))
        .cast("bigint")
        .alias("game_duration_secs"),
        format_time_control(F.col("time_control")).alias("time_control"),
        _my(F.lit("white"), F.lit("black"), u).alias("my_color"),
        _my(F.col("pgn_white_user"), F.col("pgn_black_user"), u).alias("my_username"),
        _my(F.col("pgn_black_user"), F.col("pgn_white_user"), u).alias(
            "opponent_username"
        ),
        _my(F.col("white_rating"), F.col("black_rating"), u).alias("my_rating"),
        _my(F.col("black_rating"), F.col("white_rating"), u).alias("opponent_rating"),
        _my(F.col("white_result"), F.col("black_result"), u).alias("my_result"),
        _my(F.col("black_result"), F.col("white_result"), u).alias("opponent_result"),
        F.col("pgn_current_position").alias("game_fen"),
        F.col("pgn_eco_url").alias("opening_url"),
        F.col("pgn_trans").alias("game_pgn"),
        pgn_depth(F.col("pgn_trans")).alias("moves"),
        F.lit(run_ts).cast("timestamp").alias("last_updated"),
    )


def validate_star_join(
    fact: DataFrame,
    dim_date: DataFrame,
    dim_openings: DataFrame,
    dim_results: DataFrame,
    dim_time_control: DataFrame,
) -> DataFrame:
    """J1: the reference's 5-way LEFT join projecting ``fact.*`` only
    (python_scripts.py:566-573) — a dim-coverage validation that must not
    change the row count (dims are built DISTINCT; §2.11.4).  dim_results
    role-plays twice (my/opponent).  All dims broadcast."""
    dr_my = dim_results.select(F.col("result_code").alias("__rc_my"))
    dr_op = dim_results.select(F.col("result_code").alias("__rc_op"))
    joined = (
        fact.join(F.broadcast(dim_date.select("game_date")), "game_date", "left")
        .join(
            F.broadcast(dim_openings.select(F.col("pgn_eco_url").alias("opening_url"))),
            "opening_url",
            "left",
        )
        .join(F.broadcast(dr_my), fact.my_result == dr_my.__rc_my, "left")
        .join(F.broadcast(dr_op), fact.opponent_result == dr_op.__rc_op, "left")
        .join(
            F.broadcast(dim_time_control.select("time_control")),
            "time_control",
            "left",
        )
    )
    return joined.select(*fact.columns)


def merge_fact(
    existing: DataFrame | None, incoming: DataFrame
) -> DataFrame:
    """J2/T4: latest-wins upsert by game_url on last_updated
    (python_scripts.py:576-598)."""
    return latest_wins(existing, incoming, keys=["game_url"], order_by="last_updated")


def merge_dim(
    existing: DataFrame | None, incoming: DataFrame, keys: list[str]
) -> DataFrame:
    """J3/U1/T5: insert-if-absent dimension append."""
    return insert_if_absent(existing, incoming, keys)


def build_gold(
    spark: SparkSession,
    silver: DataFrame,
    username: str,
    run_ts: str,
    existing_fact: DataFrame | None = None,
    openings_lookup: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full gold layer for one silver batch — the reference's DAG-1 tail
    (four dim loads + fact load) as one lineage."""
    dims = {
        "dim_openings": build_dim_openings(silver, openings_lookup),
        "dim_date": build_dim_date(silver),
        "dim_time_control": build_dim_time_control(silver),
        "dim_results": build_dim_results(spark),
    }
    fact = build_fact(silver, username, run_ts)
    fact = validate_star_join(
        fact,
        dims["dim_date"],
        dims["dim_openings"],
        dims["dim_results"],
        dims["dim_time_control"],
    )
    fact = merge_fact(existing_fact, fact)
    return {"fact_games": fact, **dims}
