"""st13 streaming SCD2: the incremental history merge must equal the
batch q25 build after any drained prefix, across separate drains (a
restart between arrivals), and the time-slicing stager must never put
equal timestamps on opposite sides of a batch boundary (the tie-break
contract run_streaming_scd2 depends on)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.driver import (
    q25_scd2,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.pipelines import (
    st13_streaming_scd2,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.streaming.pipeline import (
    run_streaming_scd2,
    stage_events_by_time,
)

from tests.conftest import SF_DIR

_OUT_COLS = ["user_id", "attr_value", "valid_from", "valid_to", "is_current"]


def _rows(df):
    return sorted(
        map(tuple, df.select(*_OUT_COLS).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_streaming_scd2_equals_batch(spark):
    st = st13_streaming_scd2(spark, SF_DIR)
    batch = q25_scd2(spark, SF_DIR)
    got, want = _rows(st), _rows(batch)
    assert len(got) > 0
    assert got == want


def test_streaming_scd2_incremental_across_drains(spark, tmp_path):
    """Arrivals split across two separate availableNow drains sharing a
    checkpoint — a pipeline restart between deliveries.  After drain 1
    the table equals batch-SCD2 over slice 1 only (prefix equality);
    after drain 2 it equals the full batch build."""
    staged = str(tmp_path / "slices")
    n = stage_events_by_time(
        os.path.join(SF_DIR, "events.parquet"), staged, n_files=3
    )
    assert n >= 2
    files = sorted(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")

    def batch_over(paths):
        ev = spark.read.parquet(*paths)
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        runs = (
            ev.withColumn("prev", F.lag("event_type").over(w))
            .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        )
        return runs.select(
            "user_id",
            F.col("event_type").alias("attr_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.lead("ts").over(w).isNull().alias("is_current"),
        )

    # drain 1: only the first slice is visible
    os.link(os.path.join(staged, files[0]), os.path.join(live, files[0]))
    run_streaming_scd2(spark, live, dim, ckpt)
    got1 = _rows(spark.read.parquet(dim))
    want1 = _rows(batch_over([os.path.join(live, files[0])]))
    assert got1 == want1

    # drain 2: remaining slices arrive; same checkpoint resumes
    for f in files[1:]:
        os.link(os.path.join(staged, f), os.path.join(live, f))
    run_streaming_scd2(spark, live, dim, ckpt)
    got2 = _rows(spark.read.parquet(dim))
    want2 = _rows(batch_over([os.path.join(live, f) for f in files]))
    assert got2 == want2
    assert got2 != got1  # the second drain really merged new history


def test_stage_events_by_time_keeps_equal_ts_together(tmp_path):
    """Equal timestamps must share a slice: boundaries are pushed past
    ties so (ts, event_id) ordering never straddles batches."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    ts = [base] * 5 + [base.replace(hour=1)] * 5 + [base.replace(hour=2)] * 2
    tbl = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1] * 12, pa.int64()),
            "event_type": pa.array(["a"] * 12),
        }
    )
    src = str(tmp_path / "events.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "slices")
    n = stage_events_by_time(src, out, n_files=4)
    seen: dict[object, str] = {}
    for f in sorted(os.listdir(out)):
        t = pq.read_table(os.path.join(out, f))
        for v in t["ts"].to_pylist():
            assert seen.setdefault(v, f) == f, (
                f"ts {v} split across {seen[v]} and {f}"
            )
    # every row survives the restage
    total = sum(
        pq.read_table(os.path.join(out, f)).num_rows for f in os.listdir(out)
    )
    assert total == 12 and n >= 1
