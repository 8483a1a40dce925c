"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

The 100 TB problem: parquet pruning is driven by per-file min/max
column stats, and a table sorted (or range-partitioned) on ONE column
has tight stats only on that column — a predicate on any other
dimension scans everything.  Interleaving the bits of two (or more)
dimension keys onto the Morton curve and clustering files by that
z-value gives every file a small axis-aligned rectangle of the key
space, so min/max stats prune on EITHER dimension (the technique behind
Delta Lake's Z-ORDER clustering; Morton 1966).

Two faces, kept deliberately separate:

- ``write_zordered``: the real write path — compute the z-value,
  ``repartitionByRange(z)`` + ``sortWithinPartitions(z)``, write.  One
  range exchange; file boundaries come from Spark's range sampler, so
  they are efficient but not bit-reproducible across engines.  The
  footer-stats pruning win is pinned by ``tests/test_layout.py``
  reading the parquet metadata back via pyarrow.
- the x54 *query* (plans/extensions.py) models the same layout with
  FIXED-WIDTH z-ranges (file = z >> shift: aligned 2^k × 2^k tiles of
  the grid) so the per-file stats table and the touched-file verdict
  are deterministic integer math the DuckDB oracle reproduces exactly.

Everything is BIGINT shift/mask arithmetic — whole-stage codegen, no
UDF, no shuffle beyond the one stats aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 8  # 8 bits per dimension → 256×256 grid, z < 2^16


def interleave_bits(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton z-value of two ``bits``-wide non-negative ints: a's bit i
    lands at 2i+1, b's at 2i.  A sum of shift/mask terms — pure
    codegen, exactly reproducible in any engine with integer ops."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def interleave_bits_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB rendering of :func:`interleave_bits` (same terms)."""
    terms = [
        f"((({a} >> {i}) & 1) << {2 * i + 1}) + ((({b} >> {i}) & 1) << {2 * i})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def grid_bucket_expr(col: str, minc: str, maxc: str, n: int = 1 << Z_BITS) -> Column:
    """Deterministic ``n``-cell grid coordinate of integer column
    ``col`` over its [minc, maxc] range (all three are column NAMES in
    scope) — integer ``div``, never float division, so both engines
    agree bit-for-bit on every boundary."""
    return F.expr(f"(({col} - {minc}) * {n}) div ({maxc} - {minc} + 1)")


def grid_bucket_sql(col: str, minc: str, maxc: str, n: int = 1 << Z_BITS) -> str:
    """DuckDB rendering of :func:`grid_bucket_expr`."""
    return f"(({col} - {minc}) * {n}) // ({maxc} - {minc} + 1)"


def write_zordered(
    df: DataFrame, col_a: str, col_b: str, path: str, n_files: int = 8
) -> None:
    """Cluster ``df`` on the Morton curve of (col_a, col_b) and write
    parquet: per-file min/max stats become small rectangles of the
    2-D key space, so scans filtered on EITHER column prune files.

    Grid coordinates come from the columns' own min/max (one tiny agg —
    the 'analyze then lay out' pattern); the write is ONE range
    exchange + in-partition sort, the layout cost you pay once to make
    every later scan cheaper."""
    mm = df.agg(
        F.min(col_a).alias("__amin"),
        F.max(col_a).alias("__amax"),
        F.min(col_b).alias("__bmin"),
        F.max(col_b).alias("__bmax"),
    )
    with_z = df.crossJoin(F.broadcast(mm)).withColumn(
        "__z",
        interleave_bits(
            grid_bucket_expr(col_a, "__amin", "__amax"),
            grid_bucket_expr(col_b, "__bmin", "__bmax"),
        ),
    )
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__amin", "__amax", "__bmin", "__bmax", "__z")
        .write.mode("overwrite")
        .parquet(path)
    )
