"""Driver contract, part 3: end-to-end pipeline demonstrations —
the chess medallion flow on deterministic demo data, the Structured
Streaming windowed aggregate, and the multimodal binary-column pipeline.

The chess queries are rows-only checks (their input is generated demo
data, not one of the oracle's registered tables); the streaming and
multimodal queries DO carry oracles: the streaming tumbling aggregate
must equal the batch tumbling aggregate's SQL, and the mapInPandas
feature extractor emits md5/byte-length values DuckDB recomputes
directly — a real equivalence check on a non-relational execution path.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import round_fixed
from ..multimodal.media import (
    attach_binary_payload,
    attach_image_metadata,
    extract_media_features,
    resize_plan,
)
from ..schemas import OPENINGS_CSV_SCHEMA, RAW_GAME_SCHEMA
from ..sources import demo
from ..streaming.pipeline import (
    run_stream_to_memory,
    streaming_dedup,
    streaming_stateful_sessions,
    streaming_tumbling_counts,
)
from .analytics import (
    classify_openings,
    rating_trend,
    result_distribution,
    win_rate_by_opening,
)
from .extensions import _X09_SQL, _X11_SQL
from .gold import build_gold
from .silver import bronze_to_silver


def _demo_gold(spark: SparkSession) -> dict[str, DataFrame]:
    raw = spark.createDataFrame(demo.month_payload(1), RAW_GAME_SCHEMA)
    silver = bronze_to_silver(raw)
    lookup = spark.createDataFrame(demo.OPENINGS_LOOKUP, OPENINGS_CSV_SCHEMA)
    return build_gold(
        spark, silver, demo.USERNAME, "2024-02-01 00:00:00", openings_lookup=lookup
    )


def c01_chess_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze→silver medallion transform on the deterministic demo month
    (rows-only: input is generated, not an oracle table)."""
    raw = spark.createDataFrame(demo.month_payload(1), RAW_GAME_SCHEMA)
    return bronze_to_silver(raw)


def c02_chess_gold_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full gold fact build: role-playing CASEs, 5-way validation join,
    latest-wins merge (rows-only)."""
    return _demo_gold(spark)["fact_games"]


def c03_chess_win_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README's flagship dashboard question: win rate per opening
    family × time control (rows-only)."""
    gold = _demo_gold(spark)
    return win_rate_by_opening(
        gold["fact_games"], gold["dim_openings"], gold["dim_results"]
    )


def c04_chess_openings_classified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix opening classification of whole demo games against
    the openings book (rows-only)."""
    gold = _demo_gold(spark)
    lookup = spark.createDataFrame(demo.OPENINGS_LOOKUP, OPENINGS_CSV_SCHEMA)
    return classify_openings(gold["fact_games"], lookup)


def st01_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming watermarked tumbling-window aggregate over
    the events table, drained with availableNow — must equal the batch
    tumbling aggregate (oracle = the same SQL as x09)."""
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    name = f"st_tumbling_{uuid.uuid4().hex[:8]}"
    agg = streaming_tumbling_counts(spark, stream_dir, "1 hour", "30 minutes")
    run_stream_to_memory(agg, name, output_mode="complete")
    return spark.table(name).select(
        "window_start",
        "event_type",
        "n_events",
        round_fixed(F.col("raw_sum"), 6).alias("sum_value"),
    )


def c05_chess_rating_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly rating trend: min/max/avg plus first/last rating within
    the month via max_by/min_by on timestamp — the measure the reference
    leaves to Power BI DAX (rows-only)."""
    return rating_trend(_demo_gold(spark)["fact_games"])


def c06_chess_result_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Games per result code and category, dims broadcast (rows-only)."""
    gold = _demo_gold(spark)
    return result_distribution(gold["fact_games"], gold["dim_results"])


def _staged_events_dir(sf_dir: str) -> str:
    stream_dir = tempfile.mkdtemp(prefix="events_stream_")
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(stream_dir, "events.parquet"),
    )
    return stream_dir


def st02_streaming_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState sessionization over the events stream —
    custom per-user state (session ordinal + last event time).  Drained
    with availableNow it must equal the batch gaps-and-islands
    sessionize, so the oracle is x11's SQL."""
    sessions = streaming_stateful_sessions(spark, _staged_events_dir(sf_dir))
    name = f"st_sessions_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(sessions, name, output_mode="append")
    return spark.table(name)


def st03_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over a self-unioned events stream
    (every row arrives twice): the output must be each event exactly
    once — the oracle is a plain scan of the events table."""
    deduped = streaming_dedup(spark, _staged_events_dir(sf_dir))
    name = f"st_dedup_{uuid.uuid4().hex[:8]}"
    run_stream_to_memory(deduped, name, output_mode="append")
    return spark.table(name)


_ST03_SQL = "SELECT event_id, ts, user_id, event_type FROM events"


def m01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline: documents → opaque binary payload + typed
    metadata → Arrow-batched mapInPandas feature extraction.  The
    deterministic features (md5, byte length, head bytes) are the oracle
    hook for a non-SQL execution path."""
    from ..sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    media = attach_binary_payload(docs)
    return extract_media_features(media)


_M01_SQL = """
SELECT doc_id,
       'text/plain' AS media_type,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS payload_md5,
       lower(substring(hex(encode(text)), 1, 16)) AS head_hex
FROM documents
"""


def m02_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + frame-sample plumbing: image-shaped metadata attached to
    binary payloads, geometry computed per Arrow batch in mapInPandas
    with integer math the DuckDB oracle reproduces exactly."""
    from ..sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return resize_plan(attach_image_metadata(docs))


_M02_SQL = """
WITH meta AS (
    SELECT doc_id, text,
           CAST(64 + doc_id % 960 AS INTEGER) AS width,
           CAST(64 + (doc_id * 7) % 540 AS INTEGER) AS height,
           CAST(1 + doc_id % 120 AS INTEGER) AS n_frames
    FROM documents),
geom AS (
    SELECT doc_id, text, width, height, n_frames,
           CASE WHEN GREATEST(width, height) <= 224 THEN width
                ELSE CAST(width * 224 // GREATEST(width, height) AS INTEGER) END AS new_width,
           CASE WHEN GREATEST(width, height) <= 224 THEN height
                ELSE CAST(height * 224 // GREATEST(width, height) AS INTEGER) END AS new_height
    FROM meta)
SELECT doc_id, width, height, new_width, new_height,
       CAST((n_frames - 1) // 30 + 1 AS INTEGER) AS n_sampled_frames,
       md5(text || '|' || CAST(new_width AS VARCHAR) || 'x' || CAST(new_height AS VARCHAR))
           AS thumb_md5
FROM geom
"""


PIPELINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "c01_chess_silver": c01_chess_silver,
    "c02_chess_gold_fact": c02_chess_gold_fact,
    "c03_chess_win_rate": c03_chess_win_rate,
    "c04_chess_openings_classified": c04_chess_openings_classified,
    "c05_chess_rating_trend": c05_chess_rating_trend,
    "c06_chess_result_distribution": c06_chess_result_distribution,
    "st01_streaming_tumbling": st01_streaming_tumbling,
    "st02_streaming_stateful_sessions": st02_streaming_stateful_sessions,
    "st03_streaming_dedup": st03_streaming_dedup,
    "m01_multimodal_features": m01_multimodal_features,
    "m02_multimodal_resize": m02_multimodal_resize,
}

# chess entries are rows-only by design (inputs are generated demo data);
# streaming + multimodal carry real oracles.
PIPELINE_ORACLE: dict[str, str] = {
    "st01_streaming_tumbling": _X09_SQL,
    "st02_streaming_stateful_sessions": _X11_SQL,
    "st03_streaming_dedup": _ST03_SQL,
    "m01_multimodal_features": _M01_SQL,
    "m02_multimodal_resize": _M02_SQL,
}
