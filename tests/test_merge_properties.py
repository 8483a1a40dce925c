"""Property-based tests (hypothesis) for the merge kernels
(SURVEY.md §5.2.3): latest-wins upsert is idempotent, latest-wins, and
key-unique; insert-if-absent never shrinks, never overwrites, and is
idempotent — over arbitrary generated key/version data.

Example counts are small because each example runs Spark jobs; the
generators still cover duplicate keys, ties, and empty frames.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.operators.merge import (
    insert_if_absent,
    latest_wins,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key: small range forces collisions
        st.integers(min_value=0, max_value=10),  # version
        st.integers(min_value=0, max_value=100),  # payload
    ),
    max_size=12,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k: long, v: long, payload: long")


@given(old=ROWS, new=ROWS)
@settings(**_SETTINGS)
def test_latest_wins_properties(spark, old, new):
    merged = latest_wins(_df(spark, old), _df(spark, new), ["k"], "v")
    got = {r.k: r for r in merged.collect()}

    all_rows = new + old
    keys = {k for k, _, _ in all_rows}
    # key-unique and key-complete
    assert set(got) == keys
    assert merged.count() == len(keys)
    for k in keys:
        best_v = max(v for kk, v, _ in all_rows if kk == k)
        assert got[k].v == best_v
        # ties break toward the incoming batch (new listed first)
        candidates = [
            (kk, v, p) for kk, v, p in (new if any(
                kk == k and v == best_v for kk, v, p in new
            ) else old) if kk == k and v == best_v
        ]
        assert (got[k].k, got[k].v, got[k].payload) in candidates

    # idempotence: merging the result with itself changes nothing
    again = latest_wins(merged, merged, ["k"], "v")
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, merged.collect()))


@given(old=ROWS, new=ROWS)
@settings(**_SETTINGS)
def test_insert_if_absent_properties(spark, old, new):
    old_df, new_df = _df(spark, old), _df(spark, new)
    merged = insert_if_absent(old_df, new_df, ["k"])
    got = sorted(map(tuple, merged.collect()))

    # never shrinks, never overwrites: every distinct existing row survives
    for row in set(old):
        assert row in got
    # inserted rows only for previously-absent keys
    old_keys = {k for k, _, _ in old}
    for row in got:
        assert row in set(old) or (row in set(new) and row[0] not in old_keys)

    # idempotence
    again = insert_if_absent(merged, new_df, ["k"])
    assert sorted(map(tuple, again.collect())) == got
