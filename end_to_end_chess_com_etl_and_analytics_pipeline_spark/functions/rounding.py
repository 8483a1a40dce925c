"""Cross-engine deterministic rounding.

``round(x, k)`` with k>0 is NOT portable between Spark and DuckDB for
doubles: Spark rounds the exact decimal expansion of the double
(BigDecimal HALF_UP), DuckDB multiplies by 10^k first and rounds that —
they disagree on values adjacent to a .5 boundary (observed on the
fixture data).  Scale-0 rounding of the *same* double IS portable (both
compare the identical binary value's fraction to .5, ties away from
zero).  So the engine-wide rule is: pre-scale explicitly, round at
scale 0, divide back — in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_fixed(c: Column, k: int) -> Column:
    """Portable round-to-k-decimals: round(c * 10^k, 0) / 10^k."""
    scale = float(10**k)
    return F.round(c * scale, 0) / scale


def round_fixed_sql(expr: str, k: int) -> str:
    scale = float(10**k)
    return f"ROUND(({expr}) * {scale}, 0) / {scale}"
