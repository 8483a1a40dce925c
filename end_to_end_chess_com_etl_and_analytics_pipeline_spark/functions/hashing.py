"""Deterministic cross-engine hashing primitives.

The dedup/LSH operators need hash functions that are (a) cheap and
JVM-side in Spark, and (b) *bit-identical* in the DuckDB oracle so the
driver's value-hash comparison can confirm them.  Neither engine's native
``hash()`` matches the other, but both implement MD5 identically, so the
shared contract is:

    h(s)        = first 15 hex chars of md5(s), read as a base-16 int
                  (60 bits, always non-negative, fits BIGINT)
    h_i(s)      = h(concat(i, '|', s))        # i-th independent hash fn

Spark:   CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
DuckDB:  CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)

MinHash theory per Broder (1997), banding per Mining of Massive Datasets
ch.3 — public algorithms, engine-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_CHARS = 15  # 60 bits < 63 → non-negative BIGINT in both engines


def md5_long(c: Column) -> Column:
    """60-bit non-negative integer hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, HASH_HEX_CHARS), 16, 10).cast("bigint")


def md5_long_seeded(c: Column, seed: int) -> Column:
    """i-th independent hash function: md5 over a seed-prefixed payload."""
    return md5_long(F.concat(F.lit(str(seed)), F.lit("|"), c))


def md5_long_sql(expr: str) -> str:
    """DuckDB-side rendering of :func:`md5_long` for oracle SQL."""
    return f"CAST('0x' || substring(md5({expr}), 1, {HASH_HEX_CHARS}) AS BIGINT)"


def md5_long_seeded_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"concat('{seed}', '|', {expr})")


# ---------------------------------------------------------------------------
# cheap seeded hash family for MinHash
#
# One md5 per value, then g_i(h) = (a_i * (h mod 2^30) + b_i) mod (2^31-1) —
# the classic universal family (Carter-Wegman).  a_i < 2^31 and h' < 2^30
# keep every intermediate below 2^61, so plain BIGINT arithmetic is exact
# (no overflow) in both Spark and DuckDB.  16 hash functions cost one md5
# + 16 fused multiply-adds per value instead of 16 md5s.
# ---------------------------------------------------------------------------

MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)
MINHASH_H_MOD = 1 << 30
# polynomial base combining consecutive token hashes into a shingle hash:
# acc*B + h stays under 2^51 (acc < 2^31, B < 2^20), exact in BIGINT
SHINGLE_COMBINE_B = 1_000_003


def minhash_coeffs(n: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficient lists for ``n`` hash functions.

    Fixed seed so Spark operators and DuckDB oracle SQL are built from
    the same constants; a_i in [1, p-1], b_i in [0, p-1].
    """
    import random

    rng = random.Random(0x5EED)
    a = [rng.randrange(1, MINHASH_PRIME) for _ in range(n)]
    b = [rng.randrange(0, MINHASH_PRIME) for _ in range(n)]
    return a, b
