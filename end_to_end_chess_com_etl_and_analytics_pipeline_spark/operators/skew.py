"""Skew-mitigation operators (the 100 TB playbook, SURVEY.md §4.3).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default) is the first line of defense; these helpers cover the cases AQE
can't rewrite:

- ``salted_join``: a hot-key equi-join where ONE side is small enough to
  replicate.  The skewed (big) side gets a deterministic salt in
  [0, salt_buckets); the small side is exploded once per salt value, so
  each (key, salt) bucket lands on a different reducer.  Result is
  row-identical to the plain join.
- ``two_phase_count``: heavy-hitter counting without a hot reducer —
  partial aggregation on (key, salt), then final on key.  (Spark's
  hash aggregate already does map-side partials; the explicit form is
  for pipelines that need an intermediate shuffle anyway, e.g. when the
  first phase feeds a per-bucket top-k.)

Salts are deterministic (hash of the row key, not rand()) so retries and
speculative tasks are consistent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the small side
    replicated ``salt_buckets`` times.  Semantically identical to
    ``skewed.join(small, keys, how)`` for row-preserving join types."""
    # salt over ALL columns, not the join key — rows of one hot key must
    # spread across buckets.  Engine-native hash is fine here: the salt
    # never crosses engines, and hashing (vs rand()) keeps task retries
    # and speculative attempts consistent.
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn("__salt", salt)
    right = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    return left.join(right, [*keys, "__salt"], how).drop("__salt")


def two_phase_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 8
) -> DataFrame:
    """COUNT(*) per key in two shuffles: (key, salt) partials then key
    totals — no single reducer ever sees a whole hot key."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("n"))
