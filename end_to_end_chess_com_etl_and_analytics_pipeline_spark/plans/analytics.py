"""Analytics layer: the reference's Power BI dashboard questions
(README.md:29-33, 136) re-expressed as Spark aggregations over the gold
star — win/loss rate per opening family and time class, rating trends,
result distribution, and the longest-prefix opening classifier applied
to whole games.

These are the queries a reference user actually runs; the dashboard
itself (DAX measures) is out of scope — its *semantics* are here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed
from ..operators.prefix_join import longest_prefix_match


def win_rate_by_opening(
    fact: DataFrame, dim_openings: DataFrame, dim_results: DataFrame
) -> DataFrame:
    """Win/loss/draw rate per opening family × time_control class —
    the README's headline question."""
    results = F.broadcast(dim_results.select("result_code", "result"))
    openings = F.broadcast(
        dim_openings.select(
            F.col("pgn_eco_url").alias("opening_url"), "opening_family"
        )
    )
    enriched = fact.join(
        results, fact.my_result == results.result_code, "left"
    ).join(openings, "opening_url", "left")
    return (
        enriched.groupBy("opening_family", "time_control")
        .agg(
            F.count("*").alias("n_games"),
            F.sum(F.when(F.col("result") == "Win", 1).otherwise(0)).alias("n_wins"),
            F.sum(F.when(F.col("result") == "Loss", 1).otherwise(0)).alias("n_losses"),
            F.sum(F.when(F.col("result") == "Draw", 1).otherwise(0)).alias("n_draws"),
        )
        .withColumn(
            "win_rate", round_fixed(F.col("n_wins") / F.col("n_games"), 6)
        )
    )


def rating_trend(fact: DataFrame) -> DataFrame:
    """Monthly min/max/avg of my rating plus first/last within the month
    (the reference leaves this to DAX; here it is max_by/min_by)."""
    return (
        fact.groupBy(
            F.year("game_date").alias("year"), F.month("game_date").alias("month")
        )
        .agg(
            F.count("*").alias("n_games"),
            F.min("my_rating").alias("min_rating"),
            F.max("my_rating").alias("max_rating"),
            round_fixed(F.avg("my_rating"), 2).alias("avg_rating"),
            F.min_by("my_rating", "end_time").alias("first_rating"),
            F.max_by("my_rating", "end_time").alias("last_rating"),
        )
    )


def result_distribution(fact: DataFrame, dim_results: DataFrame) -> DataFrame:
    """Games per result code/category (A2 shape)."""
    results = F.broadcast(dim_results)
    return (
        fact.join(results, fact.my_result == results.result_code, "left")
        .groupBy("my_result", "result")
        .agg(F.count("*").alias("n_games"))
        .orderBy(F.desc("n_games"), "my_result")
    )


def classify_openings(fact: DataFrame, openings_lookup: DataFrame) -> DataFrame:
    """J4/D8 applied to real games: longest opening-book prefix of each
    game's numbered PGN (the reference's get_opening interpreter loop,
    test.ipynb cell 28, as one distributed job)."""
    probe = fact.select("game_url", F.col("game_pgn"))
    return longest_prefix_match(
        probe,
        "game_pgn",
        openings_lookup.select("pgn", "name"),
        lexicon_key="pgn",
        max_tokens=30,
        payload_cols=["name"],
        id_col="game_url",
    ).withColumnRenamed("matched_pgn", "opening_pgn").withColumnRenamed(
        "name", "opening_name"
    )
