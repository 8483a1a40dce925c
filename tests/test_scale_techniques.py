"""Scale-technique tests: skew salting preserves join semantics, and
bucketed tables join without a shuffle exchange (co-located join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.prefix_join import (
    longest_prefix_match,
)
from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.skew import (
    salted_join,
    two_phase_count,
)


@pytest.fixture()
def skewed_events(spark):
    # 90% of rows share one hot key
    return spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )


def test_salted_join_equals_plain_join(spark, skewed_events):
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim_val")
    )
    plain = skewed_events.join(small, "k").select("k", "payload", "dim_val")
    salted = salted_join(skewed_events, small, ["k"]).select(
        "k", "payload", "dim_val"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_two_phase_count_equals_group_count(spark, skewed_events):
    plain = {
        (r.k): r.n
        for r in skewed_events.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    two = {(r.k): r.n for r in two_phase_count(skewed_events, ["k"]).collect()}
    assert two == plain
    # the partial phase must actually spread the hot key across buckets
    from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators import skew

    salt = F.pmod(F.hash("k", "payload"), F.lit(8))
    n_buckets = (
        skewed_events.where(F.col("k") == 7)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    assert n_buckets > 1


@pytest.fixture()
def prefix_fixture(spark):
    probe = spark.createDataFrame(
        [
            (1, "queens gambit declined exchange"),
            (2, "queens gambit accepted"),
            (3, "kings indian defense"),
            (4, "unmatched line here"),
        ],
        "doc_id INT, text STRING",
    )
    lexicon = spark.createDataFrame(
        [
            ("queens gambit", "QG"),
            ("queens gambit declined", "QGD"),
            ("kings indian", "KI"),
        ],
        "pgn STRING, name STRING",
    )
    return probe, lexicon


def test_longest_prefix_match_semantics(spark, prefix_fixture):
    probe, lexicon = prefix_fixture
    out = longest_prefix_match(
        probe, "text", lexicon, "pgn", max_tokens=4,
        payload_cols=["name"], id_col="doc_id",
    )
    got = {r.doc_id: (r.matched_pgn, r.name) for r in out.collect()}
    assert got == {
        1: ("queens gambit declined", "QGD"),
        2: ("queens gambit", "QG"),
        3: ("kings indian", "KI"),
        4: (None, None),
    }
    # keep_unmatched=False drops row 4
    inner = longest_prefix_match(
        probe, "text", lexicon, "pgn", max_tokens=4,
        payload_cols=["name"], id_col="doc_id", keep_unmatched=False,
    )
    assert {r.doc_id for r in inner.collect()} == {1, 2, 3}


def test_longest_prefix_match_preserves_duplicate_probe_rows(spark, prefix_fixture):
    _, lexicon = prefix_fixture
    dup = spark.createDataFrame(
        [("queens gambit declined x",)] * 3 + [("no match",)] * 2,
        "text STRING",
    )
    out = longest_prefix_match(dup, "text", lexicon, "pgn", max_tokens=3)
    rows = [(r.text, r.matched_pgn) for r in out.collect()]
    assert sorted(rows) == sorted(
        [("queens gambit declined x", "queens gambit declined")] * 3
        + [("no match", None)] * 2
    )


def test_longest_prefix_match_never_shuffles_text_as_key(spark, prefix_fixture):
    """The 100 TB contract: the probe text column may ride a shuffle as
    payload but must never be part of a hashpartitioning key."""
    probe, lexicon = prefix_fixture
    out = longest_prefix_match(
        probe, "text", lexicon, "pgn", max_tokens=4, id_col="doc_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            key_spec = line.split("hashpartitioning", 1)[1]
            assert "text#" not in key_spec, line


def test_runtime_bloom_filter_prunes_probe_side(spark, tmp_path):
    """The 100 TB pre-shuffle pruning lever: when a join's build side is
    selectively filtered, Catalyst can inject a bloom filter of the
    surviving keys into the PROBE side's scan, dropping non-matching
    rows before they are shuffled (`spark.sql.optimizer.runtime.
    bloomFilter.enabled`).  Local fixtures sit under the default
    size thresholds, so the thresholds are scoped down to prove the
    rewrite fires and preserves semantics."""
    import os

    big = spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 997).alias("v")
    )
    dim = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("flag")
    )
    big.write.parquet(os.path.join(str(tmp_path), "big"))
    dim.write.parquet(os.path.join(str(tmp_path), "dim"))
    scoped = {
        # force the shuffle-join path and allow tiny-table injection
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in scoped}
    try:
        for k, v in scoped.items():
            spark.conf.set(k, v)
        b = spark.read.parquet(os.path.join(str(tmp_path), "big"))
        dm = spark.read.parquet(os.path.join(str(tmp_path), "dim")).where(
            F.col("flag") == 3  # 1% of dim keys survive
        )
        j = b.join(dm, "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the probe side carries a runtime might_contain(bloom) filter
        assert "might_contain" in plan, plan
        assert j.count() == 200
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # semantics identical with the rewrite off
    plain = (
        spark.read.parquet(os.path.join(str(tmp_path), "big"))
        .join(
            spark.read.parquet(os.path.join(str(tmp_path), "dim")).where(
                F.col("flag") == 3
            ),
            "k",
        )
        .count()
    )
    assert plain == 200


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with no
    Exchange on either side (bucket-pruned co-located join)."""
    db = "bucket_test"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{tmp_path}/db'")
    try:
        left = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("a")
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") % 89).alias("b")
        )
        (
            left.write.bucketBy(8, "k").sortBy("k")
            .mode("overwrite").saveAsTable(f"{db}.left_b")
        )
        (
            right.write.bucketBy(8, "k").sortBy("k")
            .mode("overwrite").saveAsTable(f"{db}.right_b")
        )
        joined = (
            spark.table(f"{db}.left_b")
            .hint("merge")
            .join(spark.table(f"{db}.right_b"), "k")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
