"""Local replica of the driver's oracle-differential comparison:
row-count + column names + order-insensitive value comparison between a
Spark DataFrame and a DuckDB SQL result over the same parquet tables.

Stricter than the driver on values (exact equality after canonical
string rendering) so that anything passing here should hash-match in
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):  # int(inf) raises OverflowError below
            return "inf" if v > 0 else "-inf"
        # canonical shortest-repr float rendering (both engines produce
        # bit-identical doubles by construction; repr normalises -0.0 etc.)
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def compare(spark_df, duck_rel) -> None:
    """Assert spark_df ≡ duck_rel (order-insensitive).

    Uses collect()/fetchall() (not pandas) so DATE stays datetime.date
    and TIMESTAMP stays datetime.datetime in both engines."""
    s_cols = list(spark_df.columns)
    d_cols = list(duck_rel.columns)
    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    sp = spark_df.collect()
    du = duck_rel.fetchall()
    assert len(sp) == len(du), f"row count mismatch: spark={len(sp)} duck={len(du)}"
    sp_rows = sorted(tuple(_canon(row[i]) for i in s_order) for row in sp)
    du_rows = sorted(tuple(_canon(row[i]) for i in d_order) for row in du)
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        assert a == b, f"value mismatch at sorted row {i}:\n spark={a}\n duck ={b}"
