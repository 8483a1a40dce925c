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
