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


def test_streaming_scd2_untouched_buckets_not_rewritten(spark, tmp_path):
    """The partition-scoped carry-over contract (r8 verdict #4): a
    batch rewrites ONLY the hash buckets its users fall in — data files
    of untouched buckets survive the merge byte- and mtime-identical
    (the x54/compaction file-stats check applied to the dimension)."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    # batch 1: many users spread over the bucket space
    b1 = pa.table(
        {
            "event_id": pa.array(range(64), pa.int64()),
            "ts": pa.array([base] * 64, pa.timestamp("us")),
            "user_id": pa.array(list(range(64)), pa.int64()),
            "event_type": pa.array(["a"] * 64),
        }
    )
    # batch 2 (later ts): ONE user changes state
    b2 = pa.table(
        {
            "event_id": pa.array([1000], pa.int64()),
            "ts": pa.array([base.replace(hour=1)], pa.timestamp("us")),
            "user_id": pa.array([7], pa.int64()),
            "event_type": pa.array(["b"]),
        }
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    pq.write_table(b1, os.path.join(live, "events_000.parquet"))
    run_streaming_scd2(spark, live, dim, ckpt)

    def data_file_stats():
        stats = {}
        for root, _dirs, files in os.walk(dim):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    stats[p] = (st.st_mtime_ns, st.st_size)
        return stats

    before = data_file_stats()
    assert len(before) > 1  # genuinely multi-bucket layout
    pq.write_table(b2, os.path.join(live, "events_001.parquet"))
    run_streaming_scd2(spark, live, dim, ckpt)
    after = data_file_stats()

    # user 7's bucket from the xxhash64 layout rule
    target = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(7).cast("long")), F.lit(16)).alias("b")
    ).first()["b"]
    touched_dir = f"__bucket={target}"
    for p, st_before in before.items():
        if touched_dir not in p:
            assert after.get(p) == st_before, f"untouched bucket rewritten: {p}"
    # the affected bucket WAS rewritten (its old file is gone or replaced)
    assert any(
        touched_dir in p and (p not in after or after[p] != s)
        for p, s in before.items()
    )
    # and the merge is still correct: user 7 now has two versions
    got = spark.read.parquet(dim).where(F.col("user_id") == 7)
    assert got.count() == 2
    assert got.where(F.col("is_current")).first()["attr_value"] == "b"


def test_streaming_scd2_null_user_recollapses(spark, tmp_path):
    """NULL user ids are real data: their versions must merge null-
    safely across batches (a plain equi-join would silently duplicate
    the NULL user's history — NULL never equals NULL in a join)."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    b1 = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([base, base], pa.timestamp("us")),
            "user_id": pa.array([None, 5], pa.int64()),
            "event_type": pa.array(["a", "a"]),
        }
    )
    b2 = pa.table(
        {
            "event_id": pa.array([3, 4], pa.int64()),
            "ts": pa.array(
                [base.replace(hour=1)] * 2, pa.timestamp("us")
            ),
            "user_id": pa.array([None, None], pa.int64()),
            "event_type": pa.array(["a", "b"]),
        }
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    pq.write_table(b1, os.path.join(live, "events_000.parquet"))
    run_streaming_scd2(spark, live, dim, ckpt)
    pq.write_table(b2, os.path.join(live, "events_001.parquet"))
    run_streaming_scd2(spark, live, dim, ckpt)
    nulls = (
        spark.read.parquet(dim).where(F.col("user_id").isNull()).collect()
    )
    # batch oracle: events (1,'a'), (3,'a'), (4,'b') collapse to runs
    # a@ts1 (closed by b@ts2+eid4... a@ts2 is absorbed) -> 2 versions
    assert len(nulls) == 2
    assert sorted(r["attr_value"] for r in nulls) == ["a", "b"]
    assert [r["attr_value"] for r in nulls if r["is_current"]] == ["b"]


def test_streaming_scd2_null_event_type(spark, tmp_path):
    """r9 null probe finding: a NULL event_type row used to pass the
    lag collapse as a run BREAKER without becoming a run START — so
    the batch build split runs the version rows couldn't reproduce and
    stream ≠ batch.  Contract now: NULL event_type carries no dim
    signal and is excluded by BOTH builds; a run spanning a NULL-type
    event stays ONE run."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    # user 1: error, NULL, error — must collapse to ONE 'error' run.
    # The NULL-type row lands in batch 1, the second error in batch 2,
    # so the streaming merge must agree across the batch boundary.
    b1 = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([base, base.replace(hour=1)], pa.timestamp("us")),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["error", None]),
        }
    )
    b2 = pa.table(
        {
            "event_id": pa.array([3, 4], pa.int64()),
            "ts": pa.array(
                [base.replace(hour=2), base.replace(hour=3)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "event_type": pa.array(["error", "ok"]),
        }
    )
    live = str(tmp_path / "live")
    os.makedirs(live)
    dim = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ckpt")
    pq.write_table(b1, os.path.join(live, "events_000.parquet"))
    run_streaming_scd2(spark, live, dim, ckpt)
    pq.write_table(b2, os.path.join(live, "events_001.parquet"))
    run_streaming_scd2(spark, live, dim, ckpt)
    got = sorted(
        (r["attr_value"], r["is_current"])
        for r in spark.read.parquet(dim).collect()
    )
    # one 'error' run (unsplit, closed by 'ok') + the current 'ok' run
    assert got == [("error", False), ("ok", True)]


def test_q25_scd2_null_parity_with_oracle(spark, tmp_path):
    """q25 itself on NULL-type + NULL-ts events: Spark and the DuckDB
    oracle must agree (NULLS FIRST ordering stated explicitly — DuckDB
    defaults to NULLS LAST — and NULL-type rows excluded by both)."""
    import datetime as dt

    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans.driver import (
        ORACLE,
    )

    base = dt.datetime(2024, 1, 1)
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(
                [None, base, None, base.replace(hour=1), base.replace(hour=2),
                 None, base.replace(hour=3), base.replace(hour=4)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1, 1, 1, 2, 2, 2, 2, None], pa.int64()),
            "event_type": pa.array(
                ["a", "b", None, "a", "a", "b", "b", "c"]
            ),
        }
    )
    d = str(tmp_path / "fix")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "events.parquet"))
    got = _rows(q25_scd2(spark, d))
    import duckdb

    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW events AS SELECT * FROM '{os.path.join(d, 'events.parquet')}'"
    )
    want = sorted(
        (tuple(r) for r in c.sql(ORACLE["q25_scd2"]).fetchall()),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )
    got_n = [tuple(r) for r in got]
    assert len(got_n) == len(want) > 0
    assert [tuple(map(str, r)) for r in got_n] == [
        tuple(map(str, r)) for r in want
    ]


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
