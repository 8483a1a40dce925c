"""As-of and range join semantics (operators/asof.py).

The fast plans (union-tag window pass; bucketed equi-join) are verified
against brute-force theta-join formulations on the same inputs — the
naive plans are O(pairs), the fast plans are what runs at scale.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_naive,
    bucketed_range_join,
)


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 00:00:00"), lval=1),  # before any right
            Row(k="a", ts=_ts("2024-01-02 00:00:00"), lval=2),  # == right ts (inclusive)
            Row(k="a", ts=_ts("2024-01-05 12:00:00"), lval=3),
            Row(k="b", ts=_ts("2024-01-03 00:00:00"), lval=4),
            Row(k="c", ts=_ts("2024-01-04 00:00:00"), lval=5),  # key with no right rows
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=_ts("2024-01-02 00:00:00"), payload=10),
            Row(k="a", rts=_ts("2024-01-04 00:00:00"), payload=20),
            Row(k="a", rts=_ts("2024-01-06 00:00:00"), payload=30),  # future: never picked
            Row(k="b", rts=_ts("2024-01-01 00:00:00"), payload=40),
        ]
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _fixture(spark)
    got = {
        (r.k, r.lval): r.payload
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["payload"]
        ).collect()
    }
    assert got == {
        ("a", 1): None,  # no right row yet
        ("a", 2): 10,  # equal instant is visible (inclusive)
        ("a", 3): 20,  # latest at-or-before, not the future row
        ("b", 4): 40,
        ("c", 5): None,  # key absent from right
    }


def test_asof_join_null_right_keys_never_match(spark):
    # SQL ASOF equality never matches NULL keys; the window formulation
    # would otherwise group NULL-key right state into NULL-key left
    # rows.  NULL-key right rows are dropped; NULL-key left rows are
    # kept with NULL payload (asof.py: NULL-key contract).
    left = spark.createDataFrame(
        [
            Row(k=None, ts=_ts("2024-01-05 00:00:00"), lval=1),
            Row(k="a", ts=_ts("2024-01-05 00:00:00"), lval=2),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=None, rts=_ts("2024-01-01 00:00:00"), payload=99),
            Row(k="a", rts=_ts("2024-01-01 00:00:00"), payload=10),
        ]
    )
    got = {
        r.lval: r.payload
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_payload=["payload"],
        ).collect()
    }
    assert got == {1: None, 2: 10}


def test_asof_join_matches_naive(spark):
    left, right = _fixture(spark)
    args = dict(on=["k"], left_ts="ts", right_ts="rts", right_payload=["payload"])
    fast = {tuple(r) for r in asof_join(left, right, **args).collect()}
    naive = {tuple(r) for r in asof_join_naive(left, right, **args).collect()}
    assert fast == naive


def test_bucketed_range_join_matches_theta(spark):
    """Bucketed plan == plain theta join, including intervals that span
    multiple buckets and events exactly on interval edges (half-open)."""
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts("2024-01-01 00:00:00")),  # == start → in
            Row(k="a", ts=_ts("2024-01-08 00:00:00")),  # == end → out (half-open)
            Row(k="a", ts=_ts("2024-01-05 00:00:00")),
            Row(k="a", ts=_ts("2024-02-15 00:00:00")),  # inside the long interval
            Row(k="b", ts=_ts("2024-01-05 00:00:00")),  # wrong key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", s=_ts("2024-01-01 00:00:00"), e=_ts("2024-01-08 00:00:00"), rid=1),
            # 60-day interval: explodes to many buckets at bucket_secs=1 day
            Row(k="a", s=_ts("2024-01-04 00:00:00"), e=_ts("2024-03-04 00:00:00"), rid=2),
        ]
    )
    kwargs = dict(on=["k"], left_ts="ts", right_start="s", right_end="e")
    got = {
        (r.k, r.ts, r.rid)
        for r in bucketed_range_join(
            left, right, bucket_secs=24 * 3600, **kwargs
        ).collect()
    }
    theta = left.join(right, on="k").where(
        (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
    )
    want = {(r.k, r.ts, r.rid) for r in theta.collect()}
    assert got == want
    assert ("a", _ts("2024-01-08 00:00:00"), 1) not in got  # half-open edge


def test_asof_join_single_shuffle(spark):
    """The union-tag plan shuffles once on the key — no join exchange,
    no per-row subquery."""
    left, right = _fixture(spark)
    plan = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["payload"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
