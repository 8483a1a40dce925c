"""Windowed aggregation operators (batch form of SURVEY.md §2.10).

The reference has no windowed aggregations (its incremental semantics are
monthly files + latest-wins merge); these are the engine's time-series
surface over the ``events`` fixture, shared between batch and the
Structured Streaming variant (streaming.pipeline uses the same
``F.window`` expressions with a watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed


def tumbling_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    ts_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-window aggregate: count + sum(value) per window (+keys).

    NULL event times have no window membership (CONTRACTS.md): Spark's
    ``F.window`` silently drops them while SQL GROUP BY would keep a
    NULL bucket — the exclusion is made EXPLICIT here and mirrored in
    the oracle so both engines agree by construction."""
    keys = keys or ["event_type"]
    return (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.window(ts_col, window_size).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            round_fixed(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window aggregate — each event lands in size/slide windows.
    NULL event times excluded (see tumbling_agg)."""
    return (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.window(ts_col, window_size, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows via the classic gaps-and-islands formulation:
    a new session starts when the gap to the previous event of the same
    key exceeds ``gap``; session_id = running count of starts.

    (Streaming equivalent: ``F.session_window`` — kept relational here so
    the DuckDB oracle can replay it with window functions.)

    NULL event times excluded (CONTRACTS.md): a NULL has no position in
    the per-key time order — and left in, the engines would disagree
    silently (Spark windows sort NULLS FIRST, DuckDB NULLS LAST, so the
    LAG neighbours — and therefore the session splits — differ).
    """
    from pyspark.sql import Window

    gap_secs = {"30 minutes": 1800, "1 hour": 3600}.get(gap)
    if gap_secs is None:
        raise ValueError(f"unsupported gap: {gap}")
    events = events.where(F.col(ts_col).isNotNull())
    w = Window.partitionBy(key).orderBy(ts_col)
    lagged = events.withColumn("__prev", F.lag(ts_col).over(w))
    flagged = lagged.withColumn(
        "__new_session",
        (
            F.col("__prev").isNull()
            | (F.unix_timestamp(ts_col) - F.unix_timestamp("__prev") > gap_secs)
        ).cast("int"),
    )
    return (
        flagged.withColumn(
            "session_seq",
            F.sum("__new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(key, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
