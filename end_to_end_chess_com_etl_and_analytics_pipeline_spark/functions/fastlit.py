"""Compact literal arrays for driver-sized model constants.

The codebook/centroid/plane literals several operators fold into their
scans (assign_nearest, SRP planes, the PQ family) were built as parsed
``array(...)`` / ``named_struct(...)`` expressions — value-correct, but
one catalyst node per value: a 40×64-double centroid set is ~2,600
leaves that every eager analysis and every action's
analyze/optimize/codegen pass re-walks (guide §3.3: planning time
itself can become the bottleneck).

``array_lit`` builds the SAME values as a TWO-node tree —
``from_json(Literal(json_string), ddl)`` — so construction is one
py4j round trip (measured r11: 7 ms vs 328 ms for a
``Literal.create``-over-``toSeq`` fast path that paid one round trip
per nested row, and vs ~7 ms for the parsed form at 2,600 leaves) and
every plan traversal sees two nodes.  The optimizer constant-folds
``JsonToStructs`` of a foldable child on first optimization, so the
executed plan carries a plain ``Literal`` — identical runtime.

Values are bit-identical to the parsed-expression form:
``json.dumps``/``repr`` emit the shortest decimal that round-trips
float64, and both Jackson (from_json) and Spark's SQL parser read
decimal strings to the nearest double.  Pinned by
tests/test_fastlit.py against the parsed form.  Inputs must be finite
(JSON has no inf/nan tokens) — every call site feeds kmeans
centroids / SRP planes over ``usable_vec``-filtered vectors, which are
finite by contract; ``array_lit`` fails loud on non-finite values
rather than emitting a null-producing document.
"""

from __future__ import annotations

import json
import math

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _check_finite(value) -> None:
    if isinstance(value, (list, tuple)):
        for v in value:
            _check_finite(v)
    elif isinstance(value, dict):
        for v in value.values():
            _check_finite(v)
    elif isinstance(value, float) and not math.isfinite(value):
        raise ValueError(f"array_lit: non-finite value {value!r}")


def _parsed_array_lit(value, ddl: str) -> Column:
    """The legacy parsed form, kept for the value-identity test: one
    parsed expression, 'D'-suffixed doubles (repr round-trips float64
    exactly, the suffix keeps values DoubleType not Decimal)."""
    elem = ddl.strip()[len("array<"):-1].strip()

    def render(v, t: str) -> str:
        if t.startswith("array<"):
            inner = t[len("array<"):-1].strip()
            return "array(" + ", ".join(render(x, inner) for x in v) + ")"
        if t == "double":
            return repr(float(v)) + "D"
        if t in ("int", "integer"):
            return f"CAST({int(v)} AS INT)"
        if t == "bigint":
            return f"CAST({int(v)} AS BIGINT)"
        raise ValueError(f"unsupported element type {t!r}")

    return F.expr("array(" + ", ".join(render(x, elem) for x in value) + ")")


def array_lit(spark: SparkSession, value, ddl: str) -> Column:
    """``value`` (a possibly-nested list of finite doubles/ints) as a
    literal array column of DDL type ``ddl`` — a two-node
    ``from_json(Literal, ddl)`` tree that the optimizer folds to one
    ``Literal`` per action.  Values identical to the parsed form.
    ``spark`` is unused (kept so call sites read uniformly and the
    implementation can move back to a session-scoped builder)."""
    _check_finite(value)
    return F.from_json(F.lit(json.dumps(value)), ddl)
