"""Registry-wide oracle dtype audit (round-5, VERDICT r4 item #2).

The driver's correctness gate hashes TYPED values, so an oracle column
whose DuckDB type silently diverges from the Spark column's type fails
the driver even when every value matches.  Two DuckDB families are
*invisible* to pure value comparison because their Python renderings
match Spark's exactly:

  - HUGEINT  (windowed ``SUM(BIGINT)`` promotion — the round-4 x26 bug)
  - DECIMAL  (fetches as ``Decimal('1.5')`` → str "1.5" == repr(1.5))

This audit binds every oracle in the FULL registry against the fixture
views (DuckDB resolves output types at bind time — no execution) and
fails on any column in those families.  Every SUM/EXTRACT/AVG-derived
column must carry an explicit CAST in the oracle SQL.

Full per-column family comparison against the Spark schema runs in the
committed sweep (``tools/local_sweep.py`` → ``SWEEP_r{N}.txt``) and in
``oracle_compare.compare`` for every in-test differential check.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

from oracle_compare import duck_families  # noqa: E402

from end_to_end_chess_com_etl_and_analytics_pipeline_spark.plans import suites  # noqa: E402

# Families whose values stringify identically to a Spark long/double but
# whose driver-side typed hash diverges.  Empty whitelist: no registry
# query intentionally emits either family today — keep it that way.
_INVISIBLE = {"hugeint", "decimal"}


def test_no_oracle_emits_invisible_dtype_families(duck):
    offenders = {}
    for name, sql in suites.FULL_ORACLE.items():
        rel = duck.sql(sql)  # bind only — types resolve without execution
        bad = {
            col: fam
            for col, fam in duck_families(rel).items()
            if fam in _INVISIBLE or fam.startswith("array<") and any(
                inv in fam for inv in _INVISIBLE
            )
        }
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns in driver-invisible dtype families (add CAST in "
        f"the oracle SQL): {offenders}"
    )
