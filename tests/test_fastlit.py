"""array_lit (functions/fastlit.py): the two-node from_json literal
must be value-identical to the legacy parsed-expression form for every
element type the PQ/IVF/SRP call sites feed it, and must fail loud on
non-finite input (JSON has no inf/nan tokens — a silent null would
corrupt an argmin downstream)."""

from __future__ import annotations

import math

import pytest

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.functions.fastlit import (
    _parsed_array_lit,
    array_lit,
)


def _collect(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


# awkward doubles: shortest-repr round-trip cases, subnormals,
# negative zero, exponent forms — both paths must agree bit-for-bit
AWKWARD = [
    0.1,
    1 / 3,
    -0.0,
    5e-324,
    1.7976931348623157e308,
    2.2250738585072014e-308,
    123456789.123456789,
    -1e-05,
]


def test_double_array_identity(spark):
    fast = _collect(spark, array_lit(spark, AWKWARD, "array<double>"))
    slow = _collect(spark, _parsed_array_lit(AWKWARD, "array<double>"))
    assert [math.copysign(1, v) for v in fast] == [
        math.copysign(1, v) for v in slow
    ]
    assert list(fast) == list(slow) == AWKWARD


def test_nested_double_array_identity(spark):
    vals = [[float(i) + j / 7.0 for j in range(16)] for i in range(8)]
    fast = _collect(spark, array_lit(spark, vals, "array<array<double>>"))
    slow = _collect(spark, _parsed_array_lit(vals, "array<array<double>>"))
    assert [list(r) for r in fast] == [list(r) for r in slow] == vals


@pytest.mark.parametrize("ddl", ["array<int>", "array<bigint>"])
def test_integer_array_identity(spark, ddl):
    vals = [0, 1, 5, 2**31 - 1] + ([2**40] if ddl == "array<bigint>" else [])
    fast = _collect(spark, array_lit(spark, vals, ddl))
    slow = _collect(spark, _parsed_array_lit(vals, ddl))
    assert list(fast) == list(slow) == vals


def test_schema_types_match(spark):
    # dtype identity (simpleString); nullability legitimately differs
    # (from_json elements are nullable, parsed array() is not) and no
    # declared-query output schema depends on it — both forms feed
    # transform/aggregate chains whose outputs are nullable either way
    vals = [[1.0, 2.0]]
    df_fast = spark.range(1).select(
        array_lit(spark, vals, "array<array<double>>").alias("v")
    )
    df_slow = spark.range(1).select(
        _parsed_array_lit(vals, "array<array<double>>").alias("v")
    )
    assert (
        df_fast.schema["v"].dataType.simpleString()
        == df_slow.schema["v"].dataType.simpleString()
    )


@pytest.mark.parametrize("bad", [float("nan"), float("inf"), float("-inf")])
def test_non_finite_fails_loud(spark, bad):
    with pytest.raises(ValueError, match="non-finite"):
        array_lit(spark, [[1.0, bad]], "array<array<double>>")
