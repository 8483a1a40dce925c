"""Fixture-robustness: the events reader must return identical results
whatever physical timestamp type the fixture generation shipped.

Round 3 regressed 13 queries because the reader assumed TIMESTAMP(NANOS)
while the regenerated fixtures were timestamp[us].  These tests pin both
flavors — batch and streaming — so a future regeneration can't repeat it.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.sources.tables import (
    read_events_raw,
    repair_events_ts,
)

_TS = [
    "2024-01-01 00:00:01",
    "2024-01-01 00:59:59",
    "2024-01-01 01:02:03",
    "2024-01-02 23:59:58",
]


def _write_events(dir_path: str, unit: str) -> str:
    """Tiny events-shaped parquet in the given timestamp unit.

    unit='ns' produces a TIMESTAMP(NANOS) footer (parquet 2.6, no
    coercion) — the flavor Spark can only read via nanosAsLong as raw
    int64; unit='us' produces plain timestamp[us] (TIMESTAMP_NTZ)."""
    os.makedirs(dir_path, exist_ok=True)
    ts = pd.to_datetime(_TS)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ts, pa.timestamp(unit)),
            "user_id": pa.array([10, 10, 20, 20], pa.int64()),
            "event_type": pa.array(["view", "click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5, 4.5], pa.float64()),
            "props": pa.array(['{"k": 1}'] * 4),
        }
    )
    path = os.path.join(dir_path, "events.parquet")
    pq.write_table(tbl, path, version="2.6", coerce_timestamps=None)
    return path


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("events_flavors")
    dirs = {}
    for unit in ("ns", "us"):
        d = str(base / unit)
        _write_events(d, unit)
        dirs[unit] = d
    return dirs


def _batch_rows(spark, d):
    df = repair_events_ts(read_events_raw(spark, os.path.join(d, "events.parquet")))
    return sorted(
        (r.event_id, r.ts, r.user_id, r.event_type) for r in df.collect()
    )


def test_batch_reader_identical_across_flavors(spark, flavor_dirs):
    ns_rows = _batch_rows(spark, flavor_dirs["ns"])
    us_rows = _batch_rows(spark, flavor_dirs["us"])
    assert ns_rows == us_rows
    assert [str(r[1]) for r in ns_rows] == sorted(_TS)


def test_batch_reader_ts_is_timestamp_type(spark, flavor_dirs):
    from pyspark.sql import types as T

    for d in flavor_dirs.values():
        df = repair_events_ts(
            read_events_raw(spark, os.path.join(d, "events.parquet"))
        )
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_batch_reader_leaves_session_conf_clean(spark, flavor_dirs):
    """The ns-flavor read needs nanosAsLong only at schema resolution;
    it must not leak into the session (the round-3 x26 order-dependence
    suspect)."""
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    if prev is not None:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    _batch_rows(spark, flavor_dirs["ns"])
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    # the STREAMING reader must not leak it either: a declared LongType
    # schema reads nanos footers conf-free (no unscoped set on build
    # or drain)
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        _events_stream,
        run_stream_to_memory,
    )

    stream = _events_stream(spark, flavor_dirs["ns"]).select("event_id", "ts")
    run_stream_to_memory(stream, "conf_clean_ns", output_mode="append")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    if prev is not None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_streaming_reader_matches_batch(spark, flavor_dirs, unit):
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
        _events_stream,
        run_stream_to_memory,
    )

    d = flavor_dirs[unit]
    stream = _events_stream(spark, d).select(
        "event_id", "ts", "user_id", "event_type"
    )
    name = f"flavor_{unit}"
    run_stream_to_memory(stream, name, output_mode="append")
    got = sorted(
        (r.event_id, r.ts, r.user_id, r.event_type)
        for r in spark.table(name).collect()
    )
    assert got == _batch_rows(spark, d)
