"""Suite-folding schema guard: the tagged-union suites
(plans/suites.py) NULL-pad with unionByName, so two sub-queries that
share a column NAME must agree on its TYPE — in Spark (checked here)
and therefore in the oracle (the dtype audit covers that side).  A
collision would either fail analysis or, worse, silently widen a type
and hash-mismatch the driver.  This pins the invariant mechanically so
future suite folds can't regress it."""

from __future__ import annotations

import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites

from tests.conftest import SF_DIR

# streaming sub-queries EXECUTE a stream on call; each one's schema is
# its batch twin's by construction (same select list), and the batch
# twin is checked, so they are skipped here.
_STREAMING_SUBS = {
    "st06_streaming_incremental_dedup",  # schema ≡ x35
    "st07_streaming_lm_gate",            # schema ≡ x42
    "st09_streaming_sketch_merge",       # schema ≡ x53
    "st10_streaming_native_sessions",    # schema ≡ x56
}


def _family(dtype: str) -> str:
    """Type family — widening WITHIN a family (int→bigint, float→double)
    is applied identically by Spark's unionByName and DuckDB's UNION
    ALL BY NAME, so same-family collisions are safe (and the driver's
    dtype audit compares at family grain).  Cross-family collisions
    are the dangerous class."""
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return "integral"
    if dtype in ("float", "double") or dtype.startswith("decimal"):
        return "fractional"
    if dtype.startswith("array"):
        return "array"
    if dtype.startswith(("struct", "map")):
        return "nested"
    return dtype  # string, boolean, timestamp, date, binary


@pytest.mark.parametrize("suite_name", sorted(suites._SUITE_PARTS))
def test_suite_subqueries_agree_on_shared_column_types(spark, suite_name):
    seen: dict[str, tuple[str, str]] = {}  # col -> (family, first sub)
    for sub in suites._SUITE_PARTS[suite_name]:
        if sub in _STREAMING_SUBS:
            continue
        df = suites._FINE_QUERIES[sub](spark, SF_DIR)
        for col, dtype in df.dtypes:
            fam = _family(dtype)
            if col in seen:
                prev_fam, prev_sub = seen[col]
                assert fam == prev_fam, (
                    f"{suite_name}: column '{col}' is {prev_fam} in "
                    f"{prev_sub} but {fam} in {sub} — NULL-padding "
                    f"union would diverge across engines"
                )
            else:
                seen[col] = (fam, sub)


def test_streaming_subs_have_batch_twins_checked():
    """Every skipped streaming sub must actually be folded into a suite
    whose batch twin is checked — keep the skip list honest."""
    folded = {s for subs in suites._SUITE_PARTS.values() for s in subs}
    twins = {
        "st06_streaming_incremental_dedup": "x35_incremental_dedup",
        "st07_streaming_lm_gate": "x42_lm_quality",
        "st09_streaming_sketch_merge": "x53_cms_heavy_hitters",
        "st10_streaming_native_sessions": "x56_native_session_window",
    }
    for st, twin in twins.items():
        assert st in folded, st
        assert twin in suites._FINE_QUERIES, twin
    assert set(twins) == _STREAMING_SUBS


def test_x08_suite_carries_every_member_full_output(spark):
    """Registry hygiene at the 50-entry cap (r10 verdict #7): x68/x69
    score through x08_text_quality_suite, which carries 15 members — a
    silent member dropout (or a truncated union) must not be able to
    hide behind a suite-level green.  Pins, at sf0.001: (a) the suite
    output's tag set is exactly the member list, and (b) each tag's row
    count equals the member's standalone row count (the suite is a
    tagged union of FULL member outputs, nothing dropped, nothing
    doubled).  Per-member row counts are recorded in FIXTURES.md."""
    import pyspark.sql.functions as F

    name = "x08_text_quality_suite"
    members = suites._SUITE_PARTS[name]
    out = suites.SUITE_QUERIES[name](spark, SF_DIR)
    by_tag = {
        r["sub"]: r["n"]
        for r in out.groupBy("sub").agg(F.count("*").alias("n")).collect()
    }
    assert set(by_tag) == set(members), (
        f"suite tags {sorted(by_tag)} != members {sorted(members)}"
    )
    for sub in members:
        standalone = suites._FINE_QUERIES[sub](spark, SF_DIR).count()
        assert by_tag[sub] == standalone, (
            f"{sub}: suite carries {by_tag[sub]} rows, standalone "
            f"computes {standalone}"
        )
